"""Exact path-dependent TreeSHAP for the device histogram GBDT —
as dense tensor algebra instead of the recursive EXTEND/UNWIND walk.

The reference's imaging suite attributes its boosted-tree winner with
``shap.TreeExplainer`` (reference scripts/ppmi_imaging_upgrade.py:783-823,
``feature_perturbation="tree_path_dependent"``); the shap package is not
in this image, so this module implements the same quantity natively for
``nn.gbdt`` ensembles.

Semantics (identical to shap's tree_path_dependent): the value of a
feature coalition S is the expectation of the tree output when features
in S follow the sample and features outside S distribute according to
node "covers" (training sample-weight totals). The SHAP value of
feature i is the Shapley value of that game.

TPU-first lowering: a depth-D tree has 2^D leaves whose paths each touch
<= D distinct features, and the per-leaf game value factorizes per path
level. So instead of shap's sequentially-extended polynomial walk, we
enumerate ALL 2^D coalition masks for ALL 2^D leaves as one dense
[leaves, masks] block per tree (duplicate features on a path are tied to
their first-occurrence "representative" slot; masks touching non-
representative slots are masked invalid), compute every coalition's
reach probability with D fused broadcast multiplies, and contract
against precomputed Shapley weights with one einsum — no recursion, no
data-dependent control flow, vmappable over samples and scanned over
trees. Cost: O(R * N * 4^D * D) fused elementwise work, which the VPU
eats at the depths histogram GBDTs use (D <= 8 gated below).
"""
from functools import partial
from math import factorial

import jax
import jax.numpy as jnp
import numpy as np

MAX_DEPTH = 8  # [N, 2^D, 2^D] blocks; 4^D memory beyond this is silly
_CHUNK = 256  # samples per device program (bounds the dense block)


def _shapley_weight_table(depth_plus_one: int) -> np.ndarray:
    """W[k, u] = k! (u-k-1)! / u! for k < u (0 elsewhere, never read)."""
    n = depth_plus_one + 1
    W = np.zeros((n, n), np.float64)
    for u in range(1, n):
        for k in range(u):
            W[k, u] = factorial(k) * factorial(u - k - 1) / factorial(u)
    return W.astype(np.float32)


@partial(jax.jit, static_argnames=("depth", "n_features"))
def _shap_chunk(trees, bins, depth: int, n_features: int):
    """SHAP values for one sample chunk: scan over trees, dense per-tree
    [N, leaves, masks] coalition block. Returns ([N, F] margin-space
    phi, scalar expected margin offset excluding base_score)."""
    from pd_fusion.nn.gbdt import MISSING_BIN

    D, L, M = depth, 1 << depth, 1 << depth
    N = bins.shape[0]
    lvl = jnp.arange(D)
    leaf_ids = jnp.arange(L)
    # ancestor node index at each level + branch direction taken from it
    anc = leaf_ids[None, :] >> (D - lvl[:, None])  # [D, L]
    dirs = (leaf_ids[None, :] >> (D - 1 - lvl[:, None])) & 1  # [D, L]
    masks = jnp.arange(M)
    bit = ((masks[None, :] >> lvl[:, None]) & 1).astype(bool)  # [D, M]
    pc = bit.sum(0)  # [M] coalition size (valid masks use only rep slots)
    Wtab = jnp.asarray(_shapley_weight_table(D + 1))

    def tree_step(carry, tree):
        phi, ev = carry
        f_path = tree["feat"][lvl[:, None], anc]  # [D, L]
        t_path = tree["thr"][lvl[:, None], anc]
        ml_path = tree["miss_left"][lvl[:, None], anc]
        # cover fraction of the taken branch (the off-coalition factor);
        # internal-node covers derive from descendant-leaf sums (the tree
        # records only leaf covers — see nn/gbdt._build_tree)
        lc = tree["leaf_cover"]
        cov_all = jnp.stack(
            [
                jnp.pad(lc.reshape(1 << lv, -1).sum(1), (0, L - (1 << lv)))
                for lv in range(D)
            ]
            + [lc]
        )  # [D+1, L] node covers per level (node-id indexed, zero-padded)
        parent = cov_all[lvl[:, None], anc]
        child = cov_all[(lvl + 1)[:, None], anc * 2 + dirs]
        frac = jnp.where(parent > 0, child / jnp.where(parent > 0, parent, 1.0), 0.0)
        # whether the sample follows each path edge (the in-coalition factor)
        b = bins[:, f_path]  # [N, D, L]
        go_left = jnp.where(b == MISSING_BIN, ml_path[None], b <= t_path[None])
        follow = (go_left == (dirs[None] == 0)).astype(jnp.float32)  # [N, D, L]
        # duplicate path features tie to their first occurrence (rep slot)
        eq = f_path[:, None, :] == f_path[None, :, :]  # [l', l, L]
        rep = jnp.argmax(eq, axis=0)  # [D, L] first level with same feature
        is_rep = rep == lvl[:, None]  # [D, L]
        u = is_rep.sum(0)  # [L] distinct features on the path
        valid = ~((bit[:, None, :] & ~is_rep[:, :, None]).any(0))  # [L, M]
        inc = ((masks[None, None, :] >> rep[:, :, None]) & 1).astype(bool)  # [D,L,M]
        # coalition reach probability, one fused multiply per level
        P = jnp.ones((N, L, M), jnp.float32)
        for level in range(D):
            P = P * jnp.where(
                inc[level][None], follow[:, level, :, None], frac[level][None, :, None]
            )
        # Shapley contraction: for rep slot r, +W(|S|,u)P(S+r) when r in
        # the mask, -W(|S|,u)P(S) when not — both read off the same mask
        # axis with precomputed weights
        w_with = Wtab[jnp.clip(pc - 1, 0, D)[None, :], u[:, None]]  # [L, M]
        w_without = Wtab[jnp.clip(pc, 0, D)[None, :], u[:, None]]
        coef = (
            valid[None]
            * is_rep[:, :, None]
            * jnp.where(bit[:, None, :], w_with[None], -w_without[None])
        )  # [D, L, M]
        onehot = jax.nn.one_hot(f_path, n_features)  # [D, L, F]
        phi_slot = jnp.einsum("nlm,dlm->ndl", P, coef)
        phi = phi + jnp.einsum("ndl,l,dlf->nf", phi_slot, tree["leaf"], onehot)
        ev = ev + (tree["leaf"] * jnp.prod(frac, axis=0)).sum()
        return (phi, ev), None

    init = (jnp.zeros((N, n_features), jnp.float32), jnp.asarray(0.0, jnp.float32))
    (phi, ev), _ = jax.lax.scan(tree_step, init, trees)
    return phi, ev


def shap_values(trees, bins, base_score, *, depth: int):
    """Margin-space SHAP values (like TreeExplainer on a boosted binary
    classifier) for binned samples. Returns (phi [N, F], expected_value
    scalar) with sum(phi[n]) + expected_value == predict_margin(n)."""
    if depth > MAX_DEPTH:
        raise ValueError(
            f"treeshap: depth {depth} > {MAX_DEPTH} (the dense coalition "
            "block is 4^depth; use a host explainer for deeper trees)"
        )
    bins = np.asarray(bins)
    n, f = bins.shape
    if n == 0:
        # expected_value is data-independent; compute it from one
        # all-zeros probe row instead of leaving ev undefined
        _, ev0 = _shap_chunk(
            trees, jnp.zeros((_CHUNK, f), jnp.int32), depth, f
        )
        return np.zeros((0, f), np.float32), float(ev0) + float(base_score)
    out = []
    ev = None
    for lo in range(0, n, _CHUNK):
        chunk = bins[lo : lo + _CHUNK]
        pad = _CHUNK - len(chunk) if lo + _CHUNK > n else 0
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, f), chunk.dtype)])
        phi, ev_j = _shap_chunk(trees, jnp.asarray(chunk), depth, f)
        out.append(np.asarray(phi)[: len(chunk) - pad if pad else _CHUNK])
        ev = float(ev_j)
    return np.concatenate(out)[:n], ev + float(base_score)

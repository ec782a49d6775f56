"""Functional MIL attention network + jitted trainer.

Reference semantics (models/mil_attention.py):
- net: instance MLP (Linear-ReLU-Dropout) -> attention scores (plain
  tanh MLP or gated tanh*sigmoid) -> masked softmax over the bag ->
  weighted pool -> sigmoid classifier (:10-51);
- training: minibatch Adam with optional class-balanced pos_weight,
  optional global-norm grad clipping, early stopping on validation AUC
  with best-state restore (:105-155).

TPU design: bags are padded to a STATIC max length (config-fixed, vs the
reference's per-batch max — numerically identical through the masked
softmax; SURVEY §7 hard-parts) so one program serves every batch. The
whole epoch loop runs in a lax.scan; early stopping keeps the scan's
static shape by FREEZING params/optimizer once val AUC has stalled for
``patience`` epochs (exactly the reference's patience-break + restore —
see train_mil_impl). Validation AUC per
epoch is the same sort-based device reduction used everywhere
(ops.metrics.roc_auc). The masked-softmax attention pooling runs through
the fused Pallas kernel on TPU (ops.pallas_mil).
"""
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pd_fusion.nn.mlp import linear_init
from pd_fusion.ops.metrics import roc_auc
from pd_fusion.ops.pallas_mil import attention_pool


def _linear_init(key, fan_in, fan_out):
    k1, k2 = jax.random.split(key)
    return linear_init(k1, k2, fan_in, fan_out)


def mil_init(key, input_dim: int, hidden_dim: int, attn_dim: int, gated: bool) -> Dict:
    keys = jax.random.split(key, 6)
    params = {
        "instance": _linear_init(keys[0], input_dim, hidden_dim),
        "classifier": _linear_init(keys[1], hidden_dim, 1),
    }
    if gated:
        params["attn_v"] = _linear_init(keys[2], hidden_dim, attn_dim)
        params["attn_u"] = _linear_init(keys[3], hidden_dim, attn_dim)
        params["attn_w"] = _linear_init(keys[4], attn_dim, 1)
    else:
        params["attn1"] = _linear_init(keys[2], hidden_dim, attn_dim)
        params["attn2"] = _linear_init(keys[3], attn_dim, 1)
    return params


def _lin(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


def mil_apply(
    params,
    x: jax.Array,  # [B, L, D]
    mask: jax.Array,  # [B, L]
    *,
    gated: bool,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """-> logits [B] (sigmoid applied by callers; loss uses logits)."""
    h = jax.nn.relu(_lin(params["instance"], x))  # [B, L, H]
    if dropout_rate > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)
    if gated:
        v = jnp.tanh(_lin(params["attn_v"], h))
        u = jax.nn.sigmoid(_lin(params["attn_u"], h))
        scores = _lin(params["attn_w"], v * u)[..., 0]  # [B, L]
    else:
        scores = _lin(params["attn2"], jnp.tanh(_lin(params["attn1"], h)))[..., 0]
    pooled, _ = attention_pool(scores, mask, h)  # [B, H]
    return _lin(params["classifier"], pooled)[..., 0]


def _mil_loss(params, x, mask, y, w, pos_weight, gated, dropout, key):
    logits = mil_apply(params, x, mask, gated=gated, dropout_rate=dropout, dropout_key=key)
    bce = jax.nn.softplus(logits) - y * logits
    clsw = jnp.where(y >= 0.5, pos_weight, 1.0)
    # safe denominator: all-padding batches (total weight 0) must give
    # loss 0 with zero grads, not 0/0 (1e-38 is subnormal -> flushed)
    t = jnp.sum(w)
    return jnp.sum(bce * clsw * w) / jnp.where(t > 0, t, 1.0)


def train_mil_impl(
    params,
    X,  # [N, L, D] padded bags
    bag_mask,  # [N, L]
    y,  # [N]
    w_row,  # [N] per-row validity (0 for fold-padding rows)
    Xv,
    bag_mask_v,
    yv,
    wv,  # [Nv] validity weights for the (padded) val set
    key,
    lr: float,
    pos_weight,
    max_grad_norm,
    epochs: int,
    batch_size: int,
    gated: bool,
    dropout: float,
    weight_decay: float,
    use_clip: bool,
    track_best: bool,
    patience: int = 0,
    vmiss=None,
    missing_prob: float = 0.5,
):
    """Unjitted MIL trainer body — vmappable over a leading fold axis by
    the parallel CV engine; all epochs in one scan. Returns the
    val-AUC-best params when track_best else final. With patience > 0 a
    ``stopped`` carry flag freezes params/optimizer once val AUC has not
    improved for ``patience`` epochs — the reference's patience-break +
    restore EXACTLY (mil_attention.py:105-155), including the case where
    AUC would have recovered after the window; patience=0 returns the
    best epoch over the full run (the MIL reference gates tracking on
    ``patience > 0``, :137). ``w_row`` marks real rows (1) vs rows
    added by cross-fold padding (0, exact no-ops in the weighted loss);
    with w_row all-ones the training trajectory is identical to the
    pre-refactor single-fold program. ``vmiss`` ([Nv], optional) flags
    val rows whose bag is missing: the reference's train loop scores the
    val set through ``predict_proba``, which emits the constant
    ``missing_prob`` for a None bag (mil_attention.py:139-143 + 169-172)
    — those rows still enter the per-epoch AUC."""
    n = X.shape[0]
    n_batches = -(-n // batch_size)
    pad = n_batches * batch_size - n

    chain = []
    if use_clip:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.adam(lr))
    tx = optax.chain(*chain)
    opt_state = tx.init(params)

    def epoch_step(carry, ek):
        p, s, best_auc, best_p, since, stopped = carry
        perm_key, ek = jax.random.split(ek)
        perm = jax.random.permutation(perm_key, n)
        idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)]).reshape(n_batches, batch_size)
        wpad = jnp.concatenate(
            [jnp.ones((n,), X.dtype), jnp.zeros((pad,), X.dtype)]
        ).reshape(n_batches, batch_size)
        wpad = wpad * w_row[idx]
        bkeys = jax.random.split(ek, n_batches)

        def batch_step(c, inp):
            p, s = c
            bidx, bw, bk = inp
            grads = jax.grad(_mil_loss)(
                p, X[bidx], bag_mask[bidx], y[bidx], bw, pos_weight, gated, dropout, bk
            )
            updates, s = tx.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), None

        (p2, s2), _ = jax.lax.scan(batch_step, (p, s), (idx, wpad, bkeys))
        keep = lambda old, new: jax.tree_util.tree_map(
            lambda a, b: jnp.where(stopped, a, b), old, new
        )
        p, s = keep(p, p2), keep(s, s2)

        if track_best:
            val_logits = mil_apply(p, Xv, bag_mask_v, gated=gated)
            val_prob = jax.nn.sigmoid(val_logits)
            if vmiss is not None:
                val_prob = jnp.where(vmiss > 0, jnp.float32(missing_prob), val_prob)
            auc = roc_auc(yv, val_prob, wv)
            # reference (mil_attention.py:140-143): sklearn raises on NaN
            # probs from diverged params -> except -> auc = -1.0 -> never
            # beats any previous best (nor the -1.0 init). Our sort-based
            # AUC would return finite garbage on NaN scores, so check the
            # real (wv > 0) probs directly; a NaN AUC compares False in
            # `auc > best_auc`, reproducing the never-improve trajectory.
            bad = jnp.any(jnp.logical_and(jnp.isnan(val_prob), wv > 0))
            auc = jnp.where(bad, jnp.float32(jnp.nan), auc)
            improved = jnp.logical_and(jnp.logical_not(stopped), auc > best_auc)
            best_p = jax.tree_util.tree_map(
                lambda b, c: jnp.where(improved, c, b), best_p, p
            )
            best_auc = jnp.where(improved, auc, best_auc)
            since = jnp.where(stopped, since, jnp.where(improved, 0, since + 1))
            if patience > 0:
                stopped = jnp.logical_or(stopped, since >= patience)
        return (p, s, best_auc, best_p, since, stopped), None

    ekeys = jax.random.split(key, epochs)
    init = (params, opt_state, jnp.float32(-jnp.inf), params,
            jnp.int32(0), jnp.bool_(False))
    (final_p, _, best_auc, best_p, _, _), _ = jax.lax.scan(epoch_step, init, ekeys)
    if not track_best:
        return final_p
    # never-improved (e.g. NaN AUC from a single-class val set): return
    # the params at stop time — the reference's best_state-is-None path
    ever = jnp.isfinite(best_auc)
    return jax.tree_util.tree_map(
        lambda b, f: jnp.where(ever, b, f), best_p, final_p
    )


@partial(
    jax.jit,
    static_argnames=(
        "epochs",
        "batch_size",
        "gated",
        "dropout",
        "weight_decay",
        "use_clip",
        "track_best",
        "patience",
        "missing_prob",
    ),
)
def train_mil(
    params, X, bag_mask, y, Xv, bag_mask_v, yv, wv, key, lr, pos_weight,
    max_grad_norm, epochs: int, batch_size: int, gated: bool, dropout: float,
    weight_decay: float, use_clip: bool, track_best: bool, patience: int = 0,
    vmiss=None, missing_prob: float = 0.5,
):
    """Jitted single-model wrapper (all rows real)."""
    return train_mil_impl(
        params, X, bag_mask, y, jnp.ones((X.shape[0],), X.dtype), Xv, bag_mask_v,
        yv, wv, key, lr, pos_weight, max_grad_norm, epochs, batch_size, gated,
        dropout, weight_decay, use_clip, track_best, patience,
        vmiss=vmiss, missing_prob=missing_prob,
    )


@partial(jax.jit, static_argnames=("gated",))
def mil_predict(params, X, bag_mask, gated: bool):
    return jax.nn.sigmoid(mil_apply(params, X, bag_mask, gated=gated))


def pad_bags(bags, max_len: Optional[int] = None):
    """Zero-pad variable-length bags [L_i, D] -> [N, max_len, D] + mask.
    max_len defaults to the batch max (reference _pad_bags:54-63); pass a
    fixed value for static-shape reuse across calls."""
    lens = [b.shape[0] for b in bags]
    L = max_len or max(lens)
    D = bags[0].shape[1]
    X = np.zeros((len(bags), L, D), np.float32)
    mask = np.zeros((len(bags), L), np.float32)
    for i, bag in enumerate(bags):
        l = min(bag.shape[0], L)
        X[i, :l] = bag[:l]
        mask[i, :l] = 1.0
    return X, mask

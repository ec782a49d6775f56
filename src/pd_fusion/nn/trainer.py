"""Jitted training loops for the tabular model families.

TPU design: the reference runs a Python loop of epochs (and minibatches)
dispatching one tiny torch graph per step (reference fusion_late.py:36-48,
fusion_moddrop.py:69-91). Here the ENTIRE optimization — every epoch and
minibatch, including per-epoch permutations and per-batch modality-dropout
draws — is a single compiled XLA program built from ``lax.scan``. All
shapes are static: partial final minibatches are expressed as padded
index blocks with zero sample-weights (exactly reproducing per-batch-mean
gradients), which is also what makes the whole trainer ``vmap``-able over
a leading fold axis for the one-shot K-fold CV engine (pd_fusion.parallel).

Optimizer parity: optax.chain(add_decayed_weights, adam) == torch.optim.
Adam(lr, weight_decay) (L2 added to the gradient before the moments).
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from pd_fusion.nn.mlp import Params, bce_with_logits, mlp_apply


def make_optimizer(lr: float, weight_decay: float = 0.0):
    if weight_decay and weight_decay > 0.0:
        return optax.chain(optax.add_decayed_weights(weight_decay), optax.adam(lr))
    return optax.adam(lr)


def _loss(params, X, y, w, dropout_rate, key):
    logits = mlp_apply(params, X, dropout_rate=dropout_rate, dropout_key=key)
    return bce_with_logits(logits, y, w)


def fullbatch_impl(
    params: Params,
    X: jax.Array,
    y: jax.Array,
    w: Optional[jax.Array],
    key: jax.Array,
    lr: float,
    epochs: int,
    dropout: float = 0.2,
    weight_decay: float = 0.0,
) -> Params:
    """Unjitted full-batch Adam body — vmappable over a fold axis by the
    parallel CV engine; the jitted single-model wrapper is below."""
    tx = make_optimizer(lr, weight_decay)
    opt_state = tx.init(params)

    def step(carry, k):
        p, s = carry
        grads = jax.grad(_loss)(p, X, y, w, dropout, k)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), None

    keys = jax.random.split(key, epochs)
    (params, _), _ = jax.lax.scan(step, (params, opt_state), keys)
    return params


@partial(jax.jit, static_argnames=("epochs", "dropout", "weight_decay"))
def train_fullbatch(
    params: Params,
    X: jax.Array,
    y: jax.Array,
    w: Optional[jax.Array],
    key: jax.Array,
    lr: float,
    epochs: int,
    dropout: float = 0.2,
    weight_decay: float = 0.0,
) -> Params:
    """Full-batch Adam for `epochs` steps (reference fusion_late.py:36-48:
    no minibatching, no early stopping) — one lax.scan on device."""
    return fullbatch_impl(params, X, y, w, key, lr, epochs, dropout, weight_decay)


def minibatch_moddrop_impl(
    params: Params,
    X: jax.Array,
    y: jax.Array,
    w: jax.Array,
    assign: jax.Array,  # [F, M] feature->modality one-hot
    key: jax.Array,
    lr: float,
    epochs: int,
    batch_size: int,
    dropout: float = 0.2,
    weight_decay: float = 0.0,
    moddrop_rate: float = 0.2,
    per_sample: bool = False,
) -> Params:
    """Minibatch Adam with whole-modality dropout fused into the jitted
    forward. Two documented reference semantics (SURVEY §7 hard-parts):
    - per_sample=False (flagship fusion_moddrop.py:44-53): ONE Bernoulli
      draw per modality per BATCH, shared by every sample;
    - per_sample=True (the stress-suite variant,
      ppmi_stress_test.py:192-199): an independent draw per SAMPLE per
      modality.
    """
    n, _ = X.shape
    n_batches = -(-n // batch_size)
    pad = n_batches * batch_size - n
    tx = make_optimizer(lr, weight_decay)
    opt_state = tx.init(params)
    n_mod = assign.shape[1]

    def batch_loss(p, Xb, yb, wb, keep_mods, dk):
        if per_sample:
            # keep_mods [bs, M] -> per-sample feature keep [bs, F]
            feat_keep = 1.0 - jnp.dot(1.0 - keep_mods, assign.T)
            Xb = Xb * feat_keep
        else:
            feat_keep = 1.0 - jnp.dot(assign, 1.0 - keep_mods)
            Xb = Xb * feat_keep[None, :]
        logits = mlp_apply(p, Xb, dropout_rate=dropout, dropout_key=dk)
        return bce_with_logits(logits, yb, wb)

    def epoch_step(carry, ek):
        p, s = carry
        perm_key, ek = jax.random.split(ek)
        perm = jax.random.permutation(perm_key, n)
        idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)]).reshape(
            n_batches, batch_size
        )
        wpad = jnp.concatenate([w[perm], jnp.zeros((pad,), X.dtype)]).reshape(
            n_batches, batch_size
        )
        bkeys = jax.random.split(ek, n_batches)

        def batch_step(c, inp):
            p, s = c
            bidx, bw, bk = inp
            mk, dk = jax.random.split(bk)
            keep_shape = (batch_size, n_mod) if per_sample else (n_mod,)
            keep = jax.random.bernoulli(mk, 1.0 - moddrop_rate, keep_shape).astype(X.dtype)
            grads = jax.grad(batch_loss)(p, X[bidx], y[bidx], bw, keep, dk)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), None

        (p, s), _ = jax.lax.scan(batch_step, (p, s), (idx, wpad, bkeys))
        return (p, s), None

    ekeys = jax.random.split(key, epochs)
    (params, _), _ = jax.lax.scan(epoch_step, (params, opt_state), ekeys)
    return params


@partial(
    jax.jit,
    static_argnames=(
        "epochs", "batch_size", "dropout", "weight_decay", "moddrop_rate", "per_sample",
    ),
)
def train_minibatch_moddrop(
    params: Params,
    X: jax.Array,
    y: jax.Array,
    w: jax.Array,
    assign: jax.Array,
    key: jax.Array,
    lr: float,
    epochs: int,
    batch_size: int,
    dropout: float = 0.2,
    weight_decay: float = 0.0,
    moddrop_rate: float = 0.2,
    per_sample: bool = False,
) -> Params:
    return minibatch_moddrop_impl(
        params, X, y, w, assign, key, lr, epochs, batch_size, dropout, weight_decay,
        moddrop_rate, per_sample,
    )


@partial(jax.jit, static_argnames=("epochs", "dropout", "weight_decay", "patience"))
def train_fullbatch_earlystop(
    params: Params,
    X: jax.Array,
    y: jax.Array,
    Xv: jax.Array,
    yv: jax.Array,
    key: jax.Array,
    lr: float,
    pos_weight,
    epochs: int,
    dropout: float = 0.3,
    weight_decay: float = 0.0,
    patience: int = -1,
) -> Params:
    """Full-batch Adam with pos-weighted BCE and on-device best-val-AUC
    tracking (the PPMI tabular suite's MLP recipe — reference scripts/
    ppmi_train_tabular.py:145-218: BCEWithLogits(pos_weight), per-epoch
    val AUC, patience-break, best-state restore). All epochs run in ONE
    lax.scan; a ``stopped`` carry flag freezes params/optimizer once the
    AUC has not improved for ``patience`` epochs, which reproduces the
    reference's break + restore EXACTLY (including the case where AUC
    would have recovered after the patience window — the reference never
    sees those epochs). The reference's break has NO ``patience > 0``
    guard (``patience_ctr >= patience`` fires on the first non-improving
    epoch when patience=0), so patience=0 keeps that meaning here; a
    NEGATIVE patience disables stopping and returns the best-AUC epoch
    over the full run (our extension — the reference always stops).
    A val AUC the reference could not compute maps to 0.0 exactly like
    its ``except ValueError: val_auc = 0.0`` — that covers BOTH the
    single-class val set (our tie-exact AUC yields NaN) and NaN
    probabilities from diverged params (sklearn raises "Input contains
    NaN"; our sort-based AUC would return finite garbage, so the guard
    checks the probs explicitly). 0.0 still beats the -inf init, so a
    degenerate-val run restores epoch-1 params after 1+patience epochs,
    matching the reference. The stopped epochs still cost their FLOPs
    (fixed-shape scan) but nothing changes after the freeze except
    wall-clock on device."""
    from pd_fusion.ops.metrics import roc_auc

    tx = make_optimizer(lr, weight_decay)
    opt_state = tx.init(params)

    def loss_fn(p, k):
        logits = mlp_apply(p, X, dropout_rate=dropout, dropout_key=k)
        l = jax.nn.softplus(logits) - y * logits
        w = jnp.where(y >= 0.5, pos_weight, 1.0)
        return jnp.mean(l * w)

    def step(carry, k):
        p, s, best_auc, best_p, since, stopped = carry
        grads = jax.grad(loss_fn)(p, k)
        updates, s2 = tx.update(grads, s, p)
        p2 = optax.apply_updates(p, updates)
        keep = lambda old, new: jax.tree_util.tree_map(
            lambda a, b: jnp.where(stopped, a, b), old, new
        )
        p_new, s_new = keep(p, p2), keep(s, s2)
        val_prob = jax.nn.sigmoid(mlp_apply(p_new, Xv))
        auc = roc_auc(yv, val_prob)
        # reference (ppmi_train_tabular.py:199-201): roc_auc_score raising
        # maps to 0.0, which still beats the -inf init. It raises both on
        # a single-class val set (our AUC: NaN) and on NaN probabilities
        # from diverged params (our AUC: finite garbage — NaN scores sort
        # as top ranks), so the probs must be checked directly.
        bad = jnp.logical_or(jnp.isnan(auc), jnp.any(jnp.isnan(val_prob)))
        auc = jnp.where(bad, jnp.float32(0.0), auc)
        improved = jnp.logical_and(jnp.logical_not(stopped), auc > best_auc)
        best_p = jax.tree_util.tree_map(
            lambda b, c: jnp.where(improved, c, b), best_p, p_new
        )
        best_auc = jnp.where(improved, auc, best_auc)
        since = jnp.where(stopped, since, jnp.where(improved, 0, since + 1))
        # no `patience > 0` gate — the reference breaks whenever
        # patience_ctr >= patience (ppmi_train_tabular.py:207-209), so
        # patience=0 stops at the first non-improving epoch; negative
        # disables stopping (our extension). max(patience, 1): the
        # reference checks only in the non-improve branch where the
        # counter is >= 1, so an improving epoch (since == 0) must not
        # trip the patience=0 stop.
        if patience >= 0:
            stopped = jnp.logical_or(stopped, since >= max(patience, 1))
        return (p_new, s_new, best_auc, best_p, since, stopped), None

    keys = jax.random.split(key, epochs)
    init = (params, opt_state, jnp.float32(-jnp.inf), params,
            jnp.int32(0), jnp.bool_(False))
    (final_p, _, best_auc, best_p, _, _), _ = jax.lax.scan(step, init, keys)
    ever = jnp.isfinite(best_auc)
    return jax.tree_util.tree_map(
        lambda b, f: jnp.where(ever, b, f), best_p, final_p
    )


@jax.jit
def predict_logits(params: Params, X: jax.Array) -> jax.Array:
    return mlp_apply(params, X)


@jax.jit
def predict_proba_jit(params: Params, X: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(mlp_apply(params, X))

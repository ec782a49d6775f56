"""Patience-break early-stopping semantics vs eager reference-control-flow
oracles.

The reference trains with a Python epoch loop that (a) tracks the best
val-AUC state, (b) counts non-improving epochs, (c) BREAKS once the count
reaches ``patience`` and restores the best state
(reference models/mil_attention.py:105-155, scripts/ppmi_train_tabular.py
:183-214). Our trainers run ALL epochs in one fixed-shape lax.scan and
express the break as a ``stopped`` carry flag that freezes
params/optimizer — these tests assert the scanned result equals an eager
Python loop implementing the reference control flow verbatim (same keys,
same optax chain, same AUC reduction), including the subtle cases:

- AUC would have RECOVERED after the patience window (reference never
  sees those epochs — the freeze must win over the would-be-best epoch);
- degenerate single-class validation: the tabular reference maps the
  sklearn ValueError to ``val_auc = 0.0`` (beats the -inf init, so
  epoch-1 params are restored), while the MIL reference maps it to
  ``-1.0`` with a ``-1.0`` init (never improves -> stop-time params).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pd_fusion.nn.mil import _mil_loss, mil_apply, mil_init, pad_bags, train_mil
from pd_fusion.nn.mlp import mlp_apply, mlp_init
from pd_fusion.nn.trainer import make_optimizer, train_fullbatch_earlystop
from pd_fusion.ops.metrics import roc_auc


def _tab_data(seed=0, n=48, d=6, single_class_val=False):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d).astype(np.float32)
    beta = rng.randn(d).astype(np.float32)
    y = (X @ beta + 0.8 * rng.randn(n) > 0).astype(np.float32)
    Xv = rng.randn(20, d).astype(np.float32)
    yv = (Xv @ beta + 0.8 * rng.randn(20) > 0).astype(np.float32)
    if single_class_val:
        yv = np.ones_like(yv)
    return X, y, Xv, yv


def _fullbatch_oracle(params, X, y, Xv, yv, key, lr, pos_weight, epochs,
                      dropout, patience):
    """Reference scripts/ppmi_train_tabular.py:183-214 control flow, eager,
    sharing the trainer's numerics (same optimizer, loss, AUC, keys)."""
    tx = make_optimizer(lr, 0.0)
    s = tx.init(params)
    p = params

    def loss_fn(p, k):
        logits = mlp_apply(p, X, dropout_rate=dropout, dropout_key=k)
        l = jax.nn.softplus(logits) - y * logits
        w = jnp.where(y >= 0.5, pos_weight, 1.0)
        return jnp.mean(l * w)

    best_auc, best_p, bad, stop_epoch = -np.inf, None, 0, None
    for i, k in enumerate(jax.random.split(key, epochs)):
        grads = jax.grad(loss_fn)(p, k)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        probs = np.asarray(jax.nn.sigmoid(mlp_apply(p, Xv)))
        # reference: roc_auc_score raises on NaN probs AND single-class
        # val -> except ValueError -> 0.0
        if np.isnan(probs).any():
            auc = 0.0
        else:
            auc = float(roc_auc(jnp.asarray(yv), jnp.asarray(probs)))
            if np.isnan(auc):
                auc = 0.0
        if auc > best_auc:
            best_auc, best_p, bad = auc, jax.device_get(p), 0
        else:
            bad += 1
            # reference has NO patience>0 gate (ppmi_train_tabular.py:
            # 207-209); negative patience = our disabled extension
            if patience >= 0 and bad >= patience:
                stop_epoch = i
                break
    return (best_p if best_p is not None else jax.device_get(p)), stop_epoch


def _assert_tree_close(a, b, atol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, z in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), atol=atol)


def test_fullbatch_patience_matches_reference_loop():
    X, y, Xv, yv = _tab_data(seed=3)
    key = jax.random.PRNGKey(7)
    p0 = mlp_init(jax.random.PRNGKey(1), [X.shape[1], 16, 1])
    epochs, patience = 40, 2

    oracle, stop_epoch = _fullbatch_oracle(
        p0, jnp.asarray(X), jnp.asarray(y), Xv, yv, key, 1e-2,
        np.float32(1.0), epochs, 0.0, patience
    )
    # the case under test: the break actually fired before the last epoch,
    # so freeze-vs-best divergence is reachable
    assert stop_epoch is not None and stop_epoch < epochs - 1

    ours = train_fullbatch_earlystop(
        p0, jnp.asarray(X), jnp.asarray(y), jnp.asarray(Xv), jnp.asarray(yv),
        key, 1e-2, np.float32(1.0), epochs, dropout=0.0, patience=patience
    )
    _assert_tree_close(ours, oracle, atol=1e-5)


def test_fullbatch_patience_negative_is_best_over_all_epochs():
    X, y, Xv, yv = _tab_data(seed=5)
    key = jax.random.PRNGKey(11)
    p0 = mlp_init(jax.random.PRNGKey(2), [X.shape[1], 16, 1])
    epochs = 25

    oracle, stop_epoch = _fullbatch_oracle(
        p0, jnp.asarray(X), jnp.asarray(y), Xv, yv, key, 1e-2,
        np.float32(1.0), epochs, 0.0, patience=-1
    )
    assert stop_epoch is None
    ours = train_fullbatch_earlystop(
        p0, jnp.asarray(X), jnp.asarray(y), jnp.asarray(Xv), jnp.asarray(yv),
        key, 1e-2, np.float32(1.0), epochs, dropout=0.0, patience=-1
    )
    _assert_tree_close(ours, oracle, atol=1e-5)


def test_fullbatch_patience_zero_breaks_at_first_plateau():
    # the reference's break is `patience_ctr >= patience` with no >0
    # gate, so patience=0 stops at the FIRST non-improving epoch (an
    # improving epoch resets the counter and skips the check entirely)
    X, y, Xv, yv = _tab_data(seed=5)
    key = jax.random.PRNGKey(11)
    p0 = mlp_init(jax.random.PRNGKey(2), [X.shape[1], 16, 1])
    epochs = 25

    oracle, stop_epoch = _fullbatch_oracle(
        p0, jnp.asarray(X), jnp.asarray(y), Xv, yv, key, 1e-2,
        np.float32(1.0), epochs, 0.0, patience=0
    )
    assert stop_epoch is not None and stop_epoch < epochs - 1
    ours = train_fullbatch_earlystop(
        p0, jnp.asarray(X), jnp.asarray(y), jnp.asarray(Xv), jnp.asarray(yv),
        key, 1e-2, np.float32(1.0), epochs, dropout=0.0, patience=0
    )
    _assert_tree_close(ours, oracle, atol=1e-5)
    # discrimination vs the disabled (-1) run: the full run restores a
    # later best epoch, so a patience=0 implementation that never stops
    # cannot pass
    disabled, _ = _fullbatch_oracle(
        p0, jnp.asarray(X), jnp.asarray(y), Xv, yv, key, 1e-2,
        np.float32(1.0), epochs, 0.0, patience=-1
    )
    gap = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(ours), jax.tree_util.tree_leaves(disabled)
        )
    )
    assert gap > 1e-3, gap


def test_fullbatch_single_class_val_restores_epoch1():
    # reference: roc_auc_score raises on single-class y_val -> val_auc = 0.0
    # -> beats the -inf init at epoch 1 -> epoch-1 params restored after
    # 1 + patience epochs
    X, y, Xv, yv = _tab_data(seed=9, single_class_val=True)
    key = jax.random.PRNGKey(13)
    p0 = mlp_init(jax.random.PRNGKey(4), [X.shape[1], 16, 1])

    oracle, stop_epoch = _fullbatch_oracle(
        p0, jnp.asarray(X), jnp.asarray(y), Xv, yv, key, 1e-2,
        np.float32(1.0), 30, 0.0, patience=3
    )
    assert stop_epoch == 3  # epochs 2,3,4 fail to improve -> break at idx 3
    ours = train_fullbatch_earlystop(
        p0, jnp.asarray(X), jnp.asarray(y), jnp.asarray(Xv), jnp.asarray(yv),
        key, 1e-2, np.float32(1.0), 30, dropout=0.0, patience=3
    )
    _assert_tree_close(ours, oracle, atol=1e-5)


# ---------------------------------------------------------------- MIL ----

def _mil_data(seed=0, n=24, d=8, L=16, sig=0.8):
    """Weak-signal bags so the val-AUC trajectory wanders instead of
    saturating at 1.0 — required for the patience window to bind."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, n).astype(np.float32)
    bags = []
    for i in range(n):
        li = rng.randint(4, L + 1)
        bag = rng.randn(li, d).astype(np.float32)
        if y[i] == 1:
            bag[rng.choice(li, 2, replace=False)] += sig
        bags.append(bag)
    X, mask = pad_bags(bags, L)
    nv = 12
    yv = rng.randint(0, 2, nv).astype(np.float32)
    vbags = [
        rng.randn(rng.randint(4, L + 1), d).astype(np.float32) + sig * 0.5 * yv[i]
        for i in range(nv)
    ]
    Xv, mv = pad_bags(vbags, L)
    return X, mask, y, Xv, mv, yv


def _mil_oracle(params, X, mask, y, Xv, mv, yv, wv, key, lr, pos_weight,
                epochs, batch_size, gated, dropout, patience,
                vmiss=None, missing_prob=0.5):
    """Reference models/mil_attention.py:105-155 control flow, eager, with
    the trainer's exact key schedule and batch math. ``vmiss`` emulates
    predict_proba's constant ``missing_prob`` for None val bags
    (reference :169-172)."""
    n = X.shape[0]
    n_batches = -(-n // batch_size)
    pad = n_batches * batch_size - n
    tx = optax.chain(optax.adam(lr))
    s = tx.init(params)
    p = params
    best_auc, best_p, bad, stop_epoch = -1.0, None, 0, None
    for i, ek in enumerate(jax.random.split(key, epochs)):
        perm_key, ek = jax.random.split(ek)
        perm = jax.random.permutation(perm_key, n)
        idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)]).reshape(
            n_batches, batch_size)
        wpad = jnp.concatenate(
            [jnp.ones((n,), X.dtype), jnp.zeros((pad,), X.dtype)]
        ).reshape(n_batches, batch_size)
        bkeys = jax.random.split(ek, n_batches)
        for b in range(n_batches):
            grads = jax.grad(_mil_loss)(
                p, X[idx[b]], mask[idx[b]], y[idx[b]], wpad[b], pos_weight,
                gated, dropout, bkeys[b],
            )
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
        probs = np.asarray(jax.nn.sigmoid(mil_apply(p, Xv, mv, gated=gated)))
        if vmiss is not None:
            probs = np.where(np.asarray(vmiss) > 0, missing_prob, probs)
        # reference: except Exception -> -1.0 (never improves); sklearn
        # raises both on single-class y_val and on NaN probs
        if np.isnan(probs[np.asarray(wv) > 0]).any():
            auc = -1.0
        else:
            auc = float(roc_auc(yv, jnp.asarray(probs), wv))
            if np.isnan(auc):
                auc = -1.0
        if auc > best_auc:
            best_auc, best_p, bad = auc, jax.device_get(p), 0
        else:
            bad += 1
            if patience > 0 and bad >= patience:
                stop_epoch = i
                break
    return (best_p if best_p is not None else jax.device_get(p)), stop_epoch


@pytest.mark.parametrize("gated", [False, True])
def test_mil_patience_matches_reference_loop(gated):
    # seed 0 is a RECOVERY case for the ungated net: the oracle breaks at
    # epoch 2 (best at 0) but the full run's best epoch is ~6 — the freeze
    # must win over the would-be-best epoch, exactly like the reference's
    # break. Tolerance 1e-2 is eager-vs-scan Adam drift scale (measured
    # ~2e-3 after 3 epochs); a wrong restored epoch differs by ~0.18
    # (asserted below, with 5x margin).
    X, mask, y, Xv, mv, yv = _mil_data(seed=0)
    wv = np.ones(len(yv), np.float32)
    key = jax.random.PRNGKey(21)
    p0 = mil_init(jax.random.PRNGKey(6), X.shape[2], 16, 8, gated)
    epochs, patience = 30, 2
    args = tuple(map(jnp.asarray, (X, mask, y, Xv, mv, yv, wv)))

    oracle, stop_epoch = _mil_oracle(
        p0, *args, key, 1e-2, np.float32(1.0), epochs, 8, gated, 0.0, patience
    )
    assert stop_epoch is not None and stop_epoch < epochs - 1

    ours = train_mil(
        p0, *args, key, 1e-2, np.float32(1.0), np.float32(1.0), epochs, 8,
        gated, 0.0, 0.0, False, True, patience=patience,
    )
    _assert_tree_close(ours, oracle, atol=1e-2)

    if not gated:
        # discrimination: without patience the run restores a LATER best
        # epoch — the two outcomes must differ by far more than the test
        # tolerance, so a broken freeze cannot pass
        no_patience = train_mil(
            p0, *args, key, 1e-2, np.float32(1.0), np.float32(1.0), epochs, 8,
            gated, 0.0, 0.0, False, True, patience=0,
        )
        gap = max(
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(
                jax.tree_util.tree_leaves(ours),
                jax.tree_util.tree_leaves(no_patience),
            )
        )
        assert gap > 0.05, gap


def test_mil_nan_val_auc_returns_stop_time_params():
    # single-class val -> roc_auc NaN every epoch -> never improves ->
    # reference best_state stays None -> stop-time params kept
    X, mask, y, Xv, mv, yv = _mil_data(seed=4)
    yv = np.ones_like(yv)
    wv = np.ones(len(yv), np.float32)
    key = jax.random.PRNGKey(23)
    p0 = mil_init(jax.random.PRNGKey(8), X.shape[2], 16, 8, False)
    epochs, patience = 20, 3

    oracle, stop_epoch = _mil_oracle(
        p0, jnp.asarray(X), jnp.asarray(mask), jnp.asarray(y), jnp.asarray(Xv),
        jnp.asarray(mv), jnp.asarray(yv), jnp.asarray(wv), key, 1e-2,
        np.float32(1.0), epochs, 8, False, 0.0, patience
    )
    assert stop_epoch == patience - 1  # breaks as soon as bad==patience

    ours = train_mil(
        p0, jnp.asarray(X), jnp.asarray(mask), jnp.asarray(y), jnp.asarray(Xv),
        jnp.asarray(mv), jnp.asarray(yv), jnp.asarray(wv), key, 1e-2,
        np.float32(1.0), np.float32(1.0), epochs, 8, False, 0.0, 0.0,
        False, True, patience=patience,
    )
    # stop-time params after `patience` epochs; eager-vs-scan drift scale
    _assert_tree_close(ours, oracle, atol=1e-2)

    # discrimination: without the freeze the run would keep training for
    # all 20 epochs — the final params differ by far more than the
    # tolerance, so a broken stop cannot pass
    full_run = train_mil(
        p0, jnp.asarray(X), jnp.asarray(mask), jnp.asarray(y), jnp.asarray(Xv),
        jnp.asarray(mv), jnp.asarray(yv), jnp.asarray(wv), key, 1e-2,
        np.float32(1.0), np.float32(1.0), epochs, 8, False, 0.0, 0.0,
        False, False, patience=0,
    )
    gap = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(ours),
            jax.tree_util.tree_leaves(full_run),
        )
    )
    assert gap > 0.05, gap


# ------------------------------------------- NaN-probability parity ----


def test_fullbatch_nan_val_probs_map_to_zero_auc():
    # NaN val FEATURES (the reference's real-world divergence mode — its
    # quickstart data carries NaNs) make every epoch's val probs NaN.
    # sklearn's roc_auc_score raises "Input contains NaN" -> the
    # reference maps it to val_auc = 0.0 EVERY epoch: epoch 1 improves
    # (0.0 > -inf), every later epoch plateaus, break at 1 + patience,
    # epoch-1 params restored. Our sort-based AUC would return finite
    # garbage on NaN scores (which can keep "improving" and restore a
    # late diverged epoch) — the explicit probs check must pin this.
    X, y, Xv, yv = _tab_data(seed=7)
    Xv_clean = Xv.copy()
    Xv = Xv.copy()
    Xv[:3] = np.nan  # a minority of rows: garbage AUC would evolve
    key = jax.random.PRNGKey(17)
    p0 = mlp_init(jax.random.PRNGKey(3), [X.shape[1], 16, 1])
    epochs, patience = 20, 3

    oracle, stop_epoch = _fullbatch_oracle(
        p0, jnp.asarray(X), jnp.asarray(y), Xv, yv, key, 1e-2,
        np.float32(1.0), epochs, 0.0, patience
    )
    assert stop_epoch == patience  # epoch-1 improve + `patience` plateaus

    ours = train_fullbatch_earlystop(
        p0, jnp.asarray(X), jnp.asarray(y), jnp.asarray(Xv), jnp.asarray(yv),
        key, 1e-2, np.float32(1.0), epochs, dropout=0.0, patience=patience
    )
    _assert_tree_close(ours, oracle, atol=1e-5)
    for leaf in jax.tree_util.tree_leaves(ours):
        assert np.isfinite(np.asarray(leaf)).all()

    # sensitivity: restoring a later epoch (what evolving garbage AUC
    # would do) differs from the epoch-1 restore by far more than the
    # tolerance — the clean-val full run restores a late best epoch
    full, _ = _fullbatch_oracle(
        p0, jnp.asarray(X), jnp.asarray(y), Xv_clean, yv, key, 1e-2,
        np.float32(1.0), epochs, 0.0, patience=-1
    )
    gap = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(ours), jax.tree_util.tree_leaves(full)
        )
    )
    assert gap > 1e-3, gap


def test_mil_nan_val_probs_never_improve():
    # MIL reference maps the sklearn raise to -1.0 (not 0.0): with the
    # -1.0 init it NEVER improves, so after `patience` bad epochs it
    # breaks and keeps the stop-time params (best_state stays None).
    X, mask, y, Xv, mv, yv = _mil_data(seed=6)
    Xv = Xv.copy()
    Xv[:2] = np.nan
    wv = np.ones(len(yv), np.float32)
    key = jax.random.PRNGKey(29)
    p0 = mil_init(jax.random.PRNGKey(9), X.shape[2], 16, 8, False)
    epochs, patience = 20, 3

    oracle, stop_epoch = _mil_oracle(
        p0, jnp.asarray(X), jnp.asarray(mask), jnp.asarray(y), jnp.asarray(Xv),
        jnp.asarray(mv), jnp.asarray(yv), jnp.asarray(wv), key, 1e-2,
        np.float32(1.0), epochs, 8, False, 0.0, patience
    )
    assert stop_epoch == patience - 1  # bad from epoch 1, no improvement

    ours = train_mil(
        p0, jnp.asarray(X), jnp.asarray(mask), jnp.asarray(y), jnp.asarray(Xv),
        jnp.asarray(mv), jnp.asarray(yv), jnp.asarray(wv), key, 1e-2,
        np.float32(1.0), np.float32(1.0), epochs, 8, False, 0.0, 0.0,
        False, True, patience=patience,
    )
    _assert_tree_close(ours, oracle, atol=1e-2)
    for leaf in jax.tree_util.tree_leaves(ours):
        assert np.isfinite(np.asarray(leaf)).all()

    full_run = train_mil(
        p0, jnp.asarray(X), jnp.asarray(mask), jnp.asarray(y), jnp.asarray(Xv),
        jnp.asarray(mv), jnp.asarray(yv), jnp.asarray(wv), key, 1e-2,
        np.float32(1.0), np.float32(1.0), epochs, 8, False, 0.0, 0.0,
        False, False, patience=0,
    )
    gap = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(ours), jax.tree_util.tree_leaves(full_run)
        )
    )
    assert gap > 0.05, gap


# ------------------------------------- missing val bags in the AUC ----


def test_mil_missing_val_bags_enter_auc_at_missing_prob():
    # reference train loop scores the WHOLE val set via predict_proba:
    # a None bag contributes the constant missing_prob with its true
    # label (mil_attention.py:139-143 + 169-172). Dropping those rows
    # (the old behavior) changes the per-epoch AUC -> different stop
    # epoch / restored params.
    # seed 6: including the missing rows moves the stop epoch (2 vs 8)
    # and the restored params (gap ~0.18) vs dropping them
    X, mask, y, Xv, mv, yv = _mil_data(seed=6)
    nv = len(yv)
    vmiss = np.zeros(nv, np.float32)
    vmiss[[1, 4, 7, 9]] = 1.0  # bags "missing" -> constant 0.5
    # missing rows: zero bag, full mask (finite logits; overridden)
    Xv = Xv.copy(); mv = mv.copy()
    Xv[vmiss > 0] = 0.0
    mv[vmiss > 0] = 1.0
    wv = np.ones(nv, np.float32)
    key = jax.random.PRNGKey(31)
    p0 = mil_init(jax.random.PRNGKey(12), X.shape[2], 16, 8, False)
    epochs, patience = 30, 2
    args = tuple(map(jnp.asarray, (X, mask, y, Xv, mv, yv, wv)))

    oracle, stop_epoch = _mil_oracle(
        p0, *args, key, 1e-2, np.float32(1.0), epochs, 8, False, 0.0,
        patience, vmiss=vmiss, missing_prob=0.5,
    )

    ours = train_mil(
        p0, *args, key, 1e-2, np.float32(1.0), np.float32(1.0), epochs, 8,
        False, 0.0, 0.0, False, True, patience=patience,
        vmiss=jnp.asarray(vmiss), missing_prob=0.5,
    )
    _assert_tree_close(ours, oracle, atol=1e-2)

    # discrimination: dropping the missing rows (wv=0, no override — the
    # pre-fix semantics) must land on a different restored epoch
    wv_drop = wv * (1.0 - vmiss)
    dropped, drop_stop = _mil_oracle(
        p0, X, mask, y, Xv, mv, yv, wv_drop, key, 1e-2, np.float32(1.0),
        epochs, 8, False, 0.0, patience,
    )
    assert stop_epoch != drop_stop
    gap = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(oracle), jax.tree_util.tree_leaves(dropped)
        )
    )
    assert gap > 0.05, gap


def test_mil_model_val_bag_longer_than_max_len_widens_not_truncates():
    # a configured max_len shorter than a VAL bag must widen the val pad
    # (the reference pads per-batch and never truncates). Construction:
    # val bag 0 is 12 instances — a negative-looking head (first 8) and a
    # strongly positive tail (last 4) with label 1 — so truncating it to
    # max_len=8 changes the per-epoch val AUC, the stop epoch (2 vs 5)
    # and the restored params (gap ~0.06, asserted below).
    from pd_fusion.models.mil_attention import MilAttentionModel
    from pd_fusion.utils.seed import fresh_key, set_seed

    rng = np.random.RandomState(4)
    d = 8
    y = rng.randint(0, 2, 20).astype(np.float32)
    bags = [rng.randn(rng.randint(4, 9), d).astype(np.float32) + 0.6 * y[i]
            for i in range(20)]
    yv = rng.randint(0, 2, 8).astype(np.float32)
    vbags = []
    for i in range(8):
        if i == 0:
            b = rng.randn(12, d).astype(np.float32)
            b[:8] -= 1.0
            b[8:] += 3.0
            yv[0] = 1.0
        else:
            b = rng.randn(6, d).astype(np.float32) + 0.3 * yv[i]
        vbags.append(b)
    cfg = {"epochs": 25, "early_stopping_patience": 2, "hidden_dim": 16,
           "attn_dim": 8, "dropout": 0.0, "lr": 1e-2, "batch_size": 16,
           "max_len": 8}

    # HIGHEST matmul precision: on TPU the default f32 matmul runs bf16
    # MXU passes, and the model's scan program vs the oracle's fuse/tile
    # differently — 25 chained Adam epochs amplified that to 5.7e-3 on
    # the 5e-3 band (r4 live-TPU suite run). The claim under test is
    # val-pad widening semantics, so pin true-f32 matmuls.
    import jax as _jax

    with _jax.default_matmul_precision("highest"):
        set_seed(123)
        model = MilAttentionModel(d, cfg)
        model.train(bags, y, val_data=(vbags, yv))

        # oracle with the model's exact key schedule and the UNtruncated val
        set_seed(123)
        k_init, k_train = fresh_key(), fresh_key()
        p0 = mil_init(k_init, d, 16, 8, False)
        X, M = pad_bags(bags, 8)
        Xv16, Mv16 = pad_bags(vbags, 16)
        wv = np.ones(8, np.float32)
        o_wide, s_wide = _mil_oracle(
            p0, X, M, y, Xv16, Mv16, yv, wv, k_train, 1e-2, np.float32(1.0),
            25, 16, False, 0.0, 2,
        )
        # TPU tolerance: even under HIGHEST precision the model's scan
        # program and the eager oracle lower/fuse differently, and 25
        # chained Adam epochs amplify the per-step ulp drift (measured
        # 5.2e-3 on the r4 live-TPU suite; CPU passes at 5e-3). The claim
        # under test is widen-vs-truncate SEMANTICS, so the band widens on
        # TPU and the discrimination assertions below carry the proof: the
        # model must sit an order of magnitude closer to the wide oracle
        # than the truncated oracles sit from it.
        atol = 5e-3 if _jax.default_backend() == "cpu" else 2e-2
        _assert_tree_close(model.net_params, o_wide, atol=atol)

        # discrimination: the truncated-val oracle (pre-fix behavior) stops
        # at a different epoch with clearly different params
        Xv8, Mv8 = pad_bags(vbags, 8)
        o_trun, s_trun = _mil_oracle(
            p0, X, M, y, Xv8, Mv8, yv, wv, k_train, 1e-2, np.float32(1.0),
            25, 16, False, 0.0, 2,
        )
    assert s_wide != s_trun
    gap = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(o_wide), jax.tree_util.tree_leaves(o_trun)
        )
    )
    assert gap > 0.03, gap
    # and the model is unambiguously the WIDE oracle, not the truncated one
    model_vs_trun = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(model.net_params),
            jax.tree_util.tree_leaves(o_trun),
        )
    )
    assert model_vs_trun > 0.03, model_vs_trun

    probs = model.predict_proba(vbags)
    assert probs.shape == (8,) and np.isfinite(probs).all()

"""One-program K-fold cross-validation — the north-star TPU workload.

The reference runs CV as a sequential Python loop: per fold it re-inits a
torch model, runs a Python epoch loop, then evaluates each scenario with
sklearn metrics (reference run_experiment.py:361-422). Here the per-fold
work is a LEADING ARRAY AXIS:

  - per-fold training sets are padded to a common length with zero sample
    weights (exact no-ops in the loss; see nn/mlp.bce_with_logits),
  - K parameter pytrees are initialized with split keys and stacked,
  - ``jax.vmap`` over the fold axis turns the whole K-fold training into a
    single XLA program (one lax.scan over epochs inside a vmap),
  - scenario evaluation stacks to [K, S, N] and computes ALL metrics for
    ALL folds and ALL scenarios in one fused reduction program
    (ops.metrics.binary_metrics under a double vmap).

On a multi-chip mesh the fold axis and the batch axis shard over
("fold", "data") with NamedSharding — XLA inserts the psum for the batch-
axis gradient reduction; no hand-written collectives (scaling-book
recipe). Host code only fits scalers (tiny, once per fold) and formats
results.

Families supported: fusion_late / fusion_masked / unimodal_mlp (full-batch
trainer), fusion_moddrop (minibatch+moddrop trainer), moe (stacked-expert
trainer). GBDT/MIL fall back to the sequential path in run_experiment.
"""
import logging
import os
from functools import lru_cache, partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pd_fusion.data.feature_utils import (
    apply_modality_masks_np,
    feature_modality_matrix,
    get_all_feature_cols,
    get_modality_feature_cols,
)
from pd_fusion.data.missingness import (
    apply_missingness_scenario,
    get_modality_mask_matrix,
)
from pd_fusion.data.preprocess import preprocess_features
from pd_fusion.data.schema import MODALITIES, TARGET_COL
from pd_fusion.data.splits import get_subset_masks
from pd_fusion.nn.mlp import mlp_init
from pd_fusion.nn.moe import moe_apply, moe_init
from pd_fusion.nn.trainer import fullbatch_impl, minibatch_moddrop_impl
from pd_fusion.nn.mlp import mlp_apply
from pd_fusion.ops import isotonic as dev_isotonic
from pd_fusion.ops import metrics as dev_metrics
from pd_fusion.utils.seed import fresh_key

PARALLEL_CV_FAMILIES = {
    "fusion_late", "fusion_masked", "fusion_moddrop", "unimodal_mlp", "moe", "mil_attention",
}

logger = logging.getLogger("pd_fusion")


def _pad_stack(arrays: List[np.ndarray], pad_value=0.0) -> Tuple[np.ndarray, np.ndarray]:
    """Stack unequal-length [N_i, ...] arrays into [K, N_max, ...] plus a
    [K, N_max] validity-weight matrix."""
    n_max = max(a.shape[0] for a in arrays)
    K = len(arrays)
    out = np.full((K, n_max) + arrays[0].shape[1:], pad_value, dtype=np.float32)
    w = np.zeros((K, n_max), dtype=np.float32)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0]] = a
        w[i, : a.shape[0]] = 1.0
    return out, w


# ---------------------------------------------------------------------------
# stacked training programs
# ---------------------------------------------------------------------------


def _fullbatch_vmapped(params_stack, X, y, w, keys, lr, epochs, dropout, weight_decay):
    f = lambda p, x, yy, ww, k: fullbatch_impl(p, x, yy, ww, k, lr, epochs, dropout, weight_decay)
    return jax.vmap(f)(params_stack, X, y, w, keys)


def _moddrop_vmapped(
    params_stack, X, y, w, assign, keys, lr, epochs, batch_size, dropout, weight_decay,
    moddrop_rate, per_sample=False,
):
    f = lambda p, x, yy, ww, k: minibatch_moddrop_impl(
        p, x, yy, ww, assign, k, lr, epochs, batch_size, dropout, weight_decay,
        moddrop_rate, per_sample,
    )
    return jax.vmap(f)(params_stack, X, y, w, keys)


_train_folds_fullbatch = partial(jax.jit, static_argnames=("epochs", "dropout", "weight_decay"))(
    _fullbatch_vmapped
)

_train_folds_moddrop = partial(
    jax.jit,
    static_argnames=(
        "epochs", "batch_size", "dropout", "weight_decay", "moddrop_rate", "per_sample",
    ),
)(_moddrop_vmapped)


def _moe_vmapped(params_stack, x_stack, mask, y, w, lr, epochs, weight_decay):
    import optax

    tx = (
        optax.chain(optax.add_decayed_weights(weight_decay), optax.adam(lr))
        if weight_decay > 0
        else optax.adam(lr)
    )

    def train_one(p0, xs, mk, yy, ww):
        s0 = tx.init(p0)

        def loss(p):
            pr = jnp.clip(moe_apply(p, xs, mk), 1e-7, 1 - 1e-7)
            l = -(yy * jnp.log(pr) + (1 - yy) * jnp.log(1 - pr))
            # safe denominator (matches nn/mlp.bce_with_logits: subnormal
            # 1e-38 guards flush to 0 under XLA)
            t = jnp.sum(ww)
            return jnp.sum(l * ww) / jnp.where(t > 0, t, 1.0)

        def step(carry, _):
            p, s = carry
            g = jax.grad(loss)(p)
            u, s = tx.update(g, s, p)
            return (optax.apply_updates(p, u), s), None

        (p, _), _ = jax.lax.scan(step, (p0, s0), None, length=epochs)
        return p

    return jax.vmap(train_one)(params_stack, x_stack, mask, y, w)


_train_folds_moe = partial(jax.jit, static_argnames=("epochs", "weight_decay"))(_moe_vmapped)


@partial(jax.jit, static_argnames=("epochs", "weight_decay"))
def _cv_program_moe(params_stack, x_tr, m_tr, y_tr, w_tr, x_va, m_va, y_va, w_va,
                    lr, epochs, weight_decay):
    """Whole MoE CV as one dispatch/fetch (see _cv_program_fullbatch)."""
    trained = _moe_vmapped(params_stack, x_tr, m_tr, y_tr, w_tr, lr, epochs, weight_decay)
    probs = jax.vmap(
        lambda p, xs, ms: jax.vmap(lambda x, m: moe_apply(p, x, m))(xs, ms)
    )(trained, x_va, m_va)
    md = jax.vmap(jax.vmap(dev_metrics.binary_metrics))(y_va, probs, w_va)
    return dev_metrics.pack_metrics_and_probs(md, probs)


@partial(jax.jit, static_argnames=("epochs", "weight_decay"))
def _cv_program_moe_probs(params_stack, x_tr, m_tr, y_tr, w_tr, x_va, m_va,
                          x_cal, m_cal, lr, epochs, weight_decay):
    """Calibrated-MoE variant: [K, S*Nv + Nc] buffer of raw scenario probs
    then calibration-set probs (un-zeroed inputs, natural routing masks —
    the sequential CalibratedModel.fit feeds MoEModel.predict_proba the
    imputed val dict with natural masks). Host isotonic follows, layout
    mirrors _probs_with_calib."""
    trained = _moe_vmapped(params_stack, x_tr, m_tr, y_tr, w_tr, lr, epochs, weight_decay)
    probs_scen = jax.vmap(
        lambda p, xs, ms: jax.vmap(lambda x, m: moe_apply(p, x, m))(xs, ms)
    )(trained, x_va, m_va)
    probs_cal = jax.vmap(moe_apply)(trained, x_cal, m_cal)
    K = probs_scen.shape[0]
    return jnp.concatenate([probs_scen.reshape(K, -1), probs_cal], axis=1)


@partial(jax.jit, static_argnames=("epochs", "weight_decay"))
def _cv_program_moe_cal(params_stack, x_tr, m_tr, y_tr, w_tr, x_va, m_va, x_cal,
                        m_cal, ycal, calmask, y_va, w_va, lr, epochs, weight_decay):
    """Calibrated MoE CV in ONE dispatch: train + raw probs (same inputs
    as _cv_program_moe_probs) + device isotonic + packed metrics."""
    trained = _moe_vmapped(params_stack, x_tr, m_tr, y_tr, w_tr, lr, epochs, weight_decay)
    probs_scen = jax.vmap(
        lambda p, xs, ms: jax.vmap(lambda x, m: moe_apply(p, x, m))(xs, ms)
    )(trained, x_va, m_va)
    probs_cal = jax.vmap(moe_apply)(trained, x_cal, m_cal)
    return _iso_cal_metrics_pack(probs_scen, probs_cal, ycal, calmask, y_va, w_va)


def _packed_mlp_eval(trained, Xs, yv, wv):
    """predict + all metrics + pack into ONE buffer: a single device
    program whose single output array is fetched with one relay round
    trip (fetching the 6 metric arrays + probs separately costs ~1 s of
    pure readback latency at ~140 ms/fetch)."""
    probs = jax.vmap(
        lambda p, xs: jax.vmap(lambda x: jax.nn.sigmoid(mlp_apply(p, x)))(xs)
    )(trained, Xs)
    md = jax.vmap(jax.vmap(dev_metrics.binary_metrics))(yv, probs, wv)
    return dev_metrics.pack_metrics_and_probs(md, probs)


_eval_folds_scenarios_packed_mlp = jax.jit(_packed_mlp_eval)


# Whole-CV single programs: train ALL folds + evaluate ALL folds x
# scenarios + pack, in ONE dispatch with ONE result fetch. On the relay,
# each extra dispatch/fetch pair costs ~100-150 ms of pure latency; at
# N=500 that latency is comparable to the entire device compute.
@partial(jax.jit, static_argnames=("epochs", "dropout", "weight_decay"))
def _cv_program_fullbatch(params_stack, X, y, w, keys, Xs, yv, wv, lr, epochs,
                          dropout, weight_decay):
    trained = _fullbatch_vmapped(params_stack, X, y, w, keys, lr, epochs, dropout, weight_decay)
    return _packed_mlp_eval(trained, Xs, yv, wv)


@partial(
    jax.jit,
    static_argnames=(
        "epochs", "batch_size", "dropout", "weight_decay", "moddrop_rate", "per_sample",
    ),
)
def _cv_program_moddrop(params_stack, X, y, w, assign, keys, Xs, yv, wv, lr, epochs,
                        batch_size, dropout, weight_decay, moddrop_rate, per_sample):
    trained = _moddrop_vmapped(
        params_stack, X, y, w, assign, keys, lr, epochs, batch_size, dropout,
        weight_decay, moddrop_rate, per_sample,
    )
    return _packed_mlp_eval(trained, Xs, yv, wv)


# Calibrated CV: the sequential path trains per fold, fits isotonic on a
# calibration set, then evaluates each scenario through the calibrator
# (training/train.py::_maybe_calibrate, reference calibrate.py:7-56,
# run_experiment.py:367-380). Parallel equivalent in TWO dispatches:
#   1. train all folds + raw probs on all scenarios AND the calibration
#      sets, packed into one buffer (one fetch);
#   2. host fits K tiny isotonic maps (sklearn PAV) and transforms the
#      scenario probs;
#   3. a second device program computes all K x S metric sets from the
#      CALIBRATED probs (one dispatch + one fetch).


@partial(jax.jit, static_argnames=("epochs", "dropout", "weight_decay"))
def _cv_program_fullbatch_probs(params_stack, X, y, w, keys, Xs, Xc, lr, epochs,
                                dropout, weight_decay):
    trained = _fullbatch_vmapped(params_stack, X, y, w, keys, lr, epochs, dropout, weight_decay)
    return _probs_with_calib(trained, Xs, Xc)


@partial(
    jax.jit,
    static_argnames=(
        "epochs", "batch_size", "dropout", "weight_decay", "moddrop_rate", "per_sample",
    ),
)
def _cv_program_moddrop_probs(params_stack, X, y, w, assign, keys, Xs, Xc, lr, epochs,
                              batch_size, dropout, weight_decay, moddrop_rate, per_sample):
    trained = _moddrop_vmapped(
        params_stack, X, y, w, assign, keys, lr, epochs, batch_size, dropout,
        weight_decay, moddrop_rate, per_sample,
    )
    return _probs_with_calib(trained, Xs, Xc)


def _probs_scen_cal(trained, Xs, Xc):
    """Raw scenario probs [K, S, Nv] + calibration-set probs [K, Nc]."""
    probs_scen = jax.vmap(
        lambda p, xs: jax.vmap(lambda x: jax.nn.sigmoid(mlp_apply(p, x)))(xs)
    )(trained, Xs)
    probs_cal = jax.vmap(lambda p, x: jax.nn.sigmoid(mlp_apply(p, x)))(trained, Xc)
    return probs_scen, probs_cal


def _probs_with_calib(trained, Xs, Xc):
    """[K, S*Nv + Nc] buffer: scenario probs then calibration-set probs
    (host-isotonic fallback layout)."""
    probs_scen, probs_cal = _probs_scen_cal(trained, Xs, Xc)
    K = probs_scen.shape[0]
    return jnp.concatenate([probs_scen.reshape(K, -1), probs_cal], axis=1)


def _iso_cal_metrics_pack(probs_scen, probs_cal, ycal, calmask, yv, wv):
    """Device isotonic calibration (fit per fold on the calibration probs,
    transform every fold x scenario prob) + all K x S metrics + pack —
    the whole calibrated tail runs in-program, so a calibrated CV is ONE
    dispatch + ONE fetch (the host-sklearn PAV fallback costs a second
    round trip; ops/isotonic.py documents the max-min PAV lowering)."""
    K, S, nv = probs_scen.shape
    calibrated = jax.vmap(dev_isotonic.isotonic_fit_transform)(
        probs_cal, ycal, calmask, probs_scen.reshape(K, S * nv)
    ).reshape(K, S, nv)
    md = jax.vmap(jax.vmap(dev_metrics.binary_metrics))(yv, calibrated, wv)
    return dev_metrics.pack_metrics_and_probs(md, calibrated)


@partial(jax.jit, static_argnames=("epochs", "dropout", "weight_decay"))
def _cv_program_fullbatch_cal(params_stack, X, y, w, keys, Xs, Xc, ycal, calmask,
                              yv, wv, lr, epochs, dropout, weight_decay):
    """Calibrated CV in ONE dispatch: train all folds + isotonic fit +
    transform + all metrics, packed."""
    trained = _fullbatch_vmapped(params_stack, X, y, w, keys, lr, epochs, dropout, weight_decay)
    return _iso_cal_metrics_pack(*_probs_scen_cal(trained, Xs, Xc), ycal, calmask, yv, wv)


@partial(
    jax.jit,
    static_argnames=(
        "epochs", "batch_size", "dropout", "weight_decay", "moddrop_rate", "per_sample",
    ),
)
def _cv_program_moddrop_cal(params_stack, X, y, w, assign, keys, Xs, Xc, ycal,
                            calmask, yv, wv, lr, epochs, batch_size, dropout,
                            weight_decay, moddrop_rate, per_sample):
    trained = _moddrop_vmapped(
        params_stack, X, y, w, assign, keys, lr, epochs, batch_size, dropout,
        weight_decay, moddrop_rate, per_sample,
    )
    return _iso_cal_metrics_pack(*_probs_scen_cal(trained, Xs, Xc), ycal, calmask, yv, wv)


@jax.jit
def _eval_cal_packed_mlp(trained, Xs, Xc, ycal, calmask, yv, wv):
    """Mesh-path calibrated eval: probs + device isotonic + metrics in one
    (unsharded) program following the sharded training program."""
    return _iso_cal_metrics_pack(*_probs_scen_cal(trained, Xs, Xc), ycal, calmask, yv, wv)


def _pad_cal_targets(ycal_list):
    """[K, Nc_max] labels + validity mask for the device isotonic fit."""
    K = len(ycal_list)
    nc_max = max(len(y) for y in ycal_list)
    ycal = np.zeros((K, nc_max), np.float32)
    calmask = np.zeros((K, nc_max), bool)
    for i, y in enumerate(ycal_list):
        ycal[i, : len(y)] = y
        calmask[i, : len(y)] = True
    return jnp.asarray(ycal), jnp.asarray(calmask)


def _use_device_isotonic(ycal_list) -> bool:
    """Device isotonic is the default; the host-sklearn fallback covers
    huge calibration sets (the max-min lowering builds an Nc^2 buffer)
    and PD_FUSION_HOST_ISOTONIC=1 for A/B."""
    if os.environ.get("PD_FUSION_HOST_ISOTONIC") == "1":
        return False
    return max(len(y) for y in ycal_list) <= dev_isotonic.MAX_DEVICE_N


@jax.jit
def _metrics_from_probs_packed(probs, yv, wv):
    """All K x S metric sets from (host-calibrated) probs, packed with the
    probs into one fetchable buffer."""
    md = jax.vmap(jax.vmap(dev_metrics.binary_metrics))(yv, probs, wv)
    return dev_metrics.pack_metrics_and_probs(md, probs)


_eval_probs_with_calib = jax.jit(_probs_with_calib)


# ---------------------------------------------------------------------------
# device-GBDT stacked programs (train_gbdt is pure in (bins, y, w), so the
# fold axis is a plain vmap; see pd_fusion.nn.gbdt)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("n_rounds", "depth", "lr", "lam", "mcw", "mcs", "hist_mode"),
)
def _cv_program_gbdt(
    bins_tr, y_tr, w_tr, base, bins_va, y_va, w_va, *, n_rounds, depth, lr, lam,
    mcw, mcs, hist_mode
):
    """Train all folds' tree ensembles + evaluate all folds x scenarios +
    pack metrics and probs — ONE dispatch, ONE fetch."""
    from pd_fusion.nn.gbdt import predict_margin, train_gbdt

    def train_one(b, y, w, bs):
        return train_gbdt(
            b, y, w, bs, n_rounds=n_rounds, depth=depth, lr=lr, lam=lam,
            min_child_weight=mcw, min_child_samples=mcs, hist_mode=hist_mode,
        )

    trees = jax.vmap(train_one)(bins_tr, y_tr, w_tr, base)

    def pred_fold(t, bva, bs):
        return jax.vmap(lambda b: predict_margin(t, b, bs, depth=depth))(bva)

    probs = jax.nn.sigmoid(jax.vmap(pred_fold)(trees, bins_va, base))  # [K,S,Nv]
    md = jax.vmap(jax.vmap(dev_metrics.binary_metrics))(y_va, probs, w_va)
    return dev_metrics.pack_metrics_and_probs(md, probs)


@partial(
    jax.jit,
    static_argnames=("n_rounds", "depth", "lr", "lam", "mcw", "mcs", "hist_mode"),
)
def _cv_program_gbdt_probs(
    bins_tr, y_tr, w_tr, base, bins_va, bins_cal, *, n_rounds, depth, lr, lam,
    mcw, mcs, hist_mode
):
    """Calibrated variant: return raw eval + calibration-set probs packed
    into one buffer (host isotonic follows; layout mirrors
    _cv_program_fullbatch_probs)."""
    from pd_fusion.nn.gbdt import predict_margin, train_gbdt

    def train_one(b, y, w, bs):
        return train_gbdt(
            b, y, w, bs, n_rounds=n_rounds, depth=depth, lr=lr, lam=lam,
            min_child_weight=mcw, min_child_samples=mcs, hist_mode=hist_mode,
        )

    trees = jax.vmap(train_one)(bins_tr, y_tr, w_tr, base)

    def pred_fold(t, bva, bc, bs):
        m_eval = jax.vmap(lambda b: predict_margin(t, b, bs, depth=depth))(bva)
        m_cal = predict_margin(t, bc, bs, depth=depth)
        return m_eval, m_cal

    m_eval, m_cal = jax.vmap(pred_fold)(trees, bins_va, bins_cal, base)
    K = m_eval.shape[0]
    return jnp.concatenate(
        [jax.nn.sigmoid(m_eval).reshape(K, -1), jax.nn.sigmoid(m_cal)], axis=1
    )


@partial(
    jax.jit,
    static_argnames=("n_rounds", "depth", "lr", "lam", "mcw", "mcs", "hist_mode"),
)
def _cv_program_gbdt_cal(
    bins_tr, y_tr, w_tr, base, bins_va, bins_cal, ycal, calmask, yv, wv, *,
    n_rounds, depth, lr, lam, mcw, mcs, hist_mode
):
    """Calibrated device-GBDT CV in ONE dispatch: vmapped ensembles +
    device isotonic on the calibration margins + packed metrics."""
    from pd_fusion.nn.gbdt import predict_margin, train_gbdt

    def train_one(b, y, w, bs):
        return train_gbdt(
            b, y, w, bs, n_rounds=n_rounds, depth=depth, lr=lr, lam=lam,
            min_child_weight=mcw, min_child_samples=mcs, hist_mode=hist_mode,
        )

    trees = jax.vmap(train_one)(bins_tr, y_tr, w_tr, base)

    def pred_fold(t, bva, bc, bs):
        m_eval = jax.vmap(lambda b: predict_margin(t, b, bs, depth=depth))(bva)
        m_cal = predict_margin(t, bc, bs, depth=depth)
        return m_eval, m_cal

    m_eval, m_cal = jax.vmap(pred_fold)(trees, bins_va, bins_cal, base)
    return _iso_cal_metrics_pack(
        jax.nn.sigmoid(m_eval), jax.nn.sigmoid(m_cal), ycal, calmask, yv, wv
    )


def _fit_isotonic_per_fold(cal_probs, cal_y, n_cal):
    """K host isotonic fits (tiny: sklearn PAV on the calibration probs,
    same as CalibratedModel.fit)."""
    from sklearn.isotonic import IsotonicRegression

    calibrators = []
    for i in range(len(n_cal)):
        iso = IsotonicRegression(out_of_bounds="clip")
        iso.fit(cal_probs[i, : n_cal[i]], cal_y[i][: n_cal[i]])
        calibrators.append(iso)
    return calibrators


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


def _stack_params(param_list):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *param_list)


@partial(jax.jit, static_argnames=("dims",))
def _init_folds_mlp(init_keys, dims):
    """All folds' MLP params in one program (identical values to the
    per-fold eager mlp_init calls: same keys, same draws)."""
    return jax.vmap(lambda k: mlp_init(k, list(dims)))(init_keys)


@partial(jax.jit, static_argnames=("dims_items", "expert_hidden", "router_hidden"))
def _init_folds_moe(init_keys, dims_items, expert_hidden, router_hidden):
    return jax.vmap(
        lambda k: moe_init(k, dict(dims_items), list(expert_hidden), list(router_hidden))
    )(init_keys)


def _cv_mesh(K: int, N: int):
    """Build a ("fold", "data") mesh over all local devices when the fold
    and batch axes divide evenly; None on a single device (or when
    sharding would be ragged). XLA inserts the batch-axis gradient psum —
    no hand-written collectives (scaling-book recipe)."""
    n_dev = jax.device_count()
    if n_dev <= 1:
        return None
    fold_dim = 1
    for cand in range(min(K, n_dev), 0, -1):
        if K % cand == 0 and n_dev % cand == 0:
            fold_dim = cand
            break
    data_dim = n_dev // fold_dim
    if data_dim > 1 and N % data_dim != 0:
        data_dim = 1  # keep it simple: replicate data axis when ragged
    if fold_dim * data_dim <= 1:
        # a 1x1 mesh gains nothing and costs the fused single-dispatch
        # path (the mesh branch device_puts inputs eagerly and splits
        # train/eval into separate dispatches)
        return None
    devs = np.array(jax.devices()[: fold_dim * data_dim]).reshape(fold_dim, data_dim)
    from jax.sharding import Mesh

    return Mesh(devs, ("fold", "data"))


def _shard_cv_inputs(mesh, params_stack, X, y, w, keys):
    from jax.sharding import NamedSharding, PartitionSpec as P

    fold_batch = NamedSharding(mesh, P("fold", "data"))
    fold_only = NamedSharding(mesh, P("fold"))
    return (
        jax.tree_util.tree_map(lambda a: jax.device_put(a, fold_only), params_stack),
        jax.device_put(X, fold_batch),
        jax.device_put(y, fold_batch),
        jax.device_put(w, fold_batch),
        jax.device_put(keys, fold_only),
    )


def supports_parallel_cv(config) -> bool:
    if config.get("parallel_cv", True) is False:
        return False
    if config.get("model_type") == "unimodal_gbdt":
        return gbdt_device_backend(config)
    return config.get("model_type") in PARALLEL_CV_FAMILIES


def run_parallel_cv(config, df, masks, folds, eval_config, fold_masks=None, fold_keys=None):
    """Train + evaluate all folds in stacked device programs.

    ``fold_masks`` optionally supplies per-fold (train_masks, val_masks)
    dicts (used by the fused multi-seed sweep, where folds from different
    seeds carry different mask arrays); by default they derive from the
    global ``masks`` via positional slicing.

    ``fold_keys`` optionally supplies per-fold (init_key, train_key) PRNG
    pairs (the fused sweep passes keys drawn from each fold's own seed so
    fused and standalone per-seed runs produce identical params); by
    default keys split off the global chain.

    Returns (metrics_all, fold_preds):
      metrics_all: list of per-fold {scenario: {metric: float}} dicts
      fold_preds:  list of (y_true, y_prob) for the full_observation
                   scenario per fold (for preds_fold_i CSVs).
    """
    model_type = config["model_type"]
    params_cfg = config["params"]
    scenarios = eval_config.get("scenarios", [{"name": "baseline", "drop_modalities": []}])
    group_col = eval_config.get("group_col")
    K = len(folds)

    # ---- calibration plumbing (isotonic, reference calibrate.py:7-56) ----
    do_calibrate = bool(config.get("calibrate", False))
    nested = do_calibrate and bool(config.get("nested_calibration", False))
    calib_dfs: List = [None] * K
    if nested:
        if fold_masks is not None:
            raise ValueError("nested calibration is not supported with explicit fold_masks")
        from pd_fusion.data.splits import split_train_calibration

        seed = config.get("seed", 42)
        calib_size = float(config.get("calibration_split", 0.2))
        new_folds, calib_dfs = [], []
        for train_df, val_df in folds:
            reduced, calib_df = split_train_calibration(
                train_df, calib_size=calib_size, seed=seed, group_col=group_col
            )
            new_folds.append((reduced, val_df))
            calib_dfs.append(calib_df)
        folds = new_folds

    if model_type == "mil_attention":
        return _run_parallel_cv_mil(
            config, folds, masks, scenarios, group_col, calib_dfs, do_calibrate,
            nested, fold_masks, fold_keys,
        )

    if model_type == "unimodal_gbdt":
        return _run_parallel_cv_gbdt(
            config, folds, masks, scenarios, group_col, calib_dfs, do_calibrate,
            fold_masks,
        )

    # ---- per-fold host prep (scaler fits; tiny) --------------------------
    all_features = get_all_feature_cols(folds[0][0])
    modality = config.get("modality", "clinical")
    if model_type == "unimodal_mlp":
        feat_cols = get_modality_feature_cols(folds[0][0], modality)
    else:
        feat_cols = all_features
    if not feat_cols:
        raise ValueError("No feature columns for parallel CV.")

    mod_dims = {m: len(get_modality_feature_cols(folds[0][0], m)) for m in MODALITIES}

    Xtr_list, ytr_list, Xva_scen_list, yva_list = [], [], [], []
    moe_fold_data = []
    moe_cal_data = []  # per-fold (Xd_cal dict, cal masks dict), calibrated MoE only
    Xcal_list, ycal_list = [], []  # calibration-set inputs (do_calibrate only)

    for fi, (train_df, val_df) in enumerate(folds):
        if fold_masks is not None:
            train_masks, val_masks = fold_masks[fi]
        else:
            train_masks = get_subset_masks(masks, train_df.index)
            val_masks = get_subset_masks(masks, val_df.index)

        if model_type == "moe":
            Xd_tr, Xd_va, dims = {}, {}, {}
            scal = {}
            for mod in MODALITIES:
                feats = get_modality_feature_cols(train_df, mod)
                if not feats:
                    continue
                Xm, _, scl = preprocess_features(train_df, feats)
                Xv, _, _ = preprocess_features(val_df, feats, None, scl)
                Xd_tr[mod], Xd_va[mod], dims[mod] = Xm, Xv, len(feats)
                scal[mod] = scl
            moe_fold_data.append((Xd_tr, Xd_va, dims, train_masks, val_masks, scal))
            ytr_list.append(train_df[TARGET_COL].values.astype(np.float32))
            yva_list.append(val_df[TARGET_COL].values.astype(np.float32))
            if do_calibrate:
                # calibration inputs mirror the sequential path
                # (training/train.py: calibrate_X_val = X_va_dict,
                # calibrate_masks = natural val masks): imputed
                # per-modality matrices, UN-zeroed, natural routing
                # masks; nested uses the carved calib split instead
                if nested:
                    calib_df = calib_dfs[fi]
                    Xd_cal = {
                        mod: preprocess_features(
                            calib_df,
                            get_modality_feature_cols(train_df, mod),
                            None,
                            scal[mod],
                        )[0]
                        for mod in dims
                    }
                    cmask = get_subset_masks(masks, calib_df.index)
                    ycal_list.append(calib_df[TARGET_COL].values.astype(np.float32))
                else:
                    Xd_cal, cmask = Xd_va, val_masks
                    ycal_list.append(yva_list[-1])
                moe_cal_data.append((Xd_cal, cmask))
            continue

        X_tr, _, scaler = preprocess_features(train_df, feat_cols)
        X_va_raw, _, _ = preprocess_features(val_df, feat_cols, None, scaler)

        if model_type == "fusion_masked":
            tr_mm = get_modality_mask_matrix(train_masks).astype(np.float32)
            X_tr = np.concatenate([X_tr, tr_mm], axis=1)

        Xtr_list.append(X_tr.astype(np.float32))
        ytr_list.append(train_df[TARGET_COL].values.astype(np.float32))

        if do_calibrate:
            # calibration input mirrors the sequential path's
            # calibrate_X_val: the RAW preprocessed matrix (no scenario
            # zeroing), natural-mask concat for masked fusion; nested
            # uses the carved calib split, else the val fold itself
            if nested:
                calib_df = calib_dfs[fi]
                X_cal, _, _ = preprocess_features(calib_df, feat_cols, None, scaler)
                if model_type == "fusion_masked":
                    calib_masks = get_subset_masks(masks, calib_df.index)
                    cal_mm = get_modality_mask_matrix(calib_masks).astype(np.float32)
                    X_cal = np.concatenate([X_cal, cal_mm], axis=1)
                ycal_list.append(calib_df[TARGET_COL].values.astype(np.float32))
            else:
                X_cal = X_va_raw
                if model_type == "fusion_masked":
                    val_mm_nat = get_modality_mask_matrix(val_masks).astype(np.float32)
                    X_cal = np.concatenate([X_cal, val_mm_nat], axis=1)
                ycal_list.append(val_df[TARGET_COL].values.astype(np.float32))
            Xcal_list.append(X_cal.astype(np.float32))

        # scenario-transformed eval inputs for this fold
        assign = feature_modality_matrix(feat_cols)
        scen_X = []
        for scenario in scenarios:
            cur = apply_missingness_scenario(val_df, scenario, val_masks)
            mm = get_modality_mask_matrix(cur).astype(np.float32)
            Xs = apply_modality_masks_np(X_va_raw, mm, assign)
            if model_type == "fusion_masked":
                Xs = np.concatenate([Xs, mm], axis=1)
            scen_X.append(Xs.astype(np.float32))
        Xva_scen_list.append(np.stack(scen_X))  # [S, Nv, F']
        yva_list.append(val_df[TARGET_COL].values.astype(np.float32))

    lr = float(params_cfg["lr"])
    epochs = int(params_cfg["epochs"])
    dropout = float(params_cfg.get("dropout", 0.2))
    wd = float(params_cfg.get("weight_decay", 0.0))

    if model_type == "moe":
        return _run_parallel_cv_moe(
            config, moe_fold_data, ytr_list, yva_list, scenarios, group_col, folds,
            fold_keys=fold_keys,
            cal_data=(moe_cal_data, ycal_list) if do_calibrate else None,
        )

    # ---- stack + train ----------------------------------------------------
    X_stack, w_tr = _pad_stack(Xtr_list)
    y_stack, _ = _pad_stack([y[:, None] for y in ytr_list])
    y_stack = y_stack[..., 0]

    input_dim = X_stack.shape[-1]
    dims = [input_dim, *params_cfg["hidden_dims"], 1]
    if fold_keys is not None:
        init_keys = jnp.stack([fold_keys[i][0] for i in range(K)])
        keys = jnp.stack([fold_keys[i][1] for i in range(K)])
    else:
        # interleaved (init, train) draws per fold — the exact order the
        # sequential fold loop consumes the global chain, so parallel and
        # sequential runs of the same seed use identical keys per fold
        drawn = [(fresh_key(), fresh_key()) for _ in range(K)]
        init_keys = jnp.stack([a for a, _ in drawn])
        keys = jnp.stack([b for _, b in drawn])
    # all folds' params in ONE jitted program: eager per-fold mlp_init is
    # ~6 tiny dispatches per layer, each paying a relay RTT
    params_stack = _init_folds_mlp(init_keys, tuple(dims))

    mesh = _cv_mesh(K, X_stack.shape[1]) if config.get("cv_mesh", "auto") != "off" else None
    if mesh is not None:
        params_stack, X_stack, y_stack, w_tr, keys = _shard_cv_inputs(
            mesh, params_stack, jnp.asarray(X_stack), jnp.asarray(y_stack),
            jnp.asarray(w_tr), keys,
        )
        logger.info(f"parallel CV sharded over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    # ---- stacked scenario-eval inputs (built before the train dispatch so
    # the single-device path can run train+eval as ONE program) ------------
    # per-fold arrays are [S, Nv_i, F]; pad the fold-varying Nv axis
    nv_max = max(a.shape[1] for a in Xva_scen_list)
    S_dim, F_dim = Xva_scen_list[0].shape[0], Xva_scen_list[0].shape[2]
    Xs_stack = np.zeros((K, S_dim, nv_max, F_dim), np.float32)
    for i, a in enumerate(Xva_scen_list):
        Xs_stack[i, :, : a.shape[1], :] = a
    yv_stack, wv = _pad_stack([y[:, None] for y in yva_list])
    yv_stack = yv_stack[..., 0]
    S = len(scenarios)
    yv_rep = np.repeat(yv_stack[:, None, :], S, axis=1)
    wv_rep = np.repeat(wv[:, None, :], S, axis=1)

    is_moddrop = model_type == "fusion_moddrop"
    if is_moddrop:
        # assignment matrix over the sorted-name block layout
        from pd_fusion.models.fusion_moddrop import _assignment_matrix

        assign_md, _ = _assignment_matrix(mod_dims)
        md_args = (
            jnp.asarray(assign_md),
            keys,
        )
        md_hp = (
            lr,
            epochs,
            # clamps to the PADDED width (one static program for all
            # folds). Equal-sized folds reproduce the sequential loop
            # exactly (parity-tested); ragged folds permute/batch over
            # n_max with zero-weight padding rows — still exact moddrop
            # semantics (padded rows are loss no-ops) but a different
            # RNG realization than the sequential per-fold n_i loop.
            min(int(params_cfg.get("batch_size", 32)), X_stack.shape[1]),
            dropout,
            wd,
            float(params_cfg.get("moddrop_rate", 0.2)),
            bool(params_cfg.get("moddrop_per_sample", False)),
        )

    if do_calibrate and _use_device_isotonic(ycal_list):
        # ONE dispatch + ONE fetch for the whole calibrated CV: the
        # isotonic fit/transform runs in-program (ops/isotonic.py)
        Xc_stack, _ = _pad_stack(Xcal_list)
        ycal_j, calmask_j = _pad_cal_targets(ycal_list)
        cal_eval = (
            jnp.asarray(Xs_stack), jnp.asarray(Xc_stack), ycal_j, calmask_j,
            jnp.asarray(yv_rep), jnp.asarray(wv_rep),
        )
        if mesh is None:
            if is_moddrop:
                packed = np.asarray(
                    _cv_program_moddrop_cal(
                        params_stack, X_stack, y_stack, w_tr, md_args[0], md_args[1],
                        *cal_eval, *md_hp,
                    )
                )
            else:
                packed = np.asarray(
                    _cv_program_fullbatch_cal(
                        params_stack, X_stack, y_stack, w_tr, keys, *cal_eval,
                        lr, epochs, dropout, wd,
                    )
                )
        else:
            if is_moddrop:
                trained = _train_folds_moddrop(
                    params_stack, X_stack, y_stack, w_tr, md_args[0], md_args[1], *md_hp
                )
            else:
                trained = _train_folds_fullbatch(
                    params_stack, X_stack, y_stack, w_tr, keys, lr, epochs, dropout, wd
                )
            packed = np.asarray(_eval_cal_packed_mlp(trained, *cal_eval))
    elif do_calibrate:
        # pad calibration sets to a common width for the stacked program
        Xc_stack, _ = _pad_stack(Xcal_list)
        n_cal = [len(y) for y in ycal_list]
        if mesh is None:
            if is_moddrop:
                buf = np.asarray(
                    _cv_program_moddrop_probs(
                        params_stack, X_stack, y_stack, w_tr, md_args[0], md_args[1],
                        jnp.asarray(Xs_stack), jnp.asarray(Xc_stack), *md_hp,
                    )
                )
            else:
                buf = np.asarray(
                    _cv_program_fullbatch_probs(
                        params_stack, X_stack, y_stack, w_tr, keys,
                        jnp.asarray(Xs_stack), jnp.asarray(Xc_stack),
                        lr, epochs, dropout, wd,
                    )
                )
        else:
            if is_moddrop:
                trained = _train_folds_moddrop(
                    params_stack, X_stack, y_stack, w_tr, md_args[0], md_args[1], *md_hp
                )
            else:
                trained = _train_folds_fullbatch(
                    params_stack, X_stack, y_stack, w_tr, keys, lr, epochs, dropout, wd
                )
            buf = np.asarray(
                _eval_probs_with_calib(trained, jnp.asarray(Xs_stack), jnp.asarray(Xc_stack))
            )
        raw_probs = buf[:, : S * nv_max].reshape(K, S, nv_max)
        cal_probs = buf[:, S * nv_max:]
        calibrators = _fit_isotonic_per_fold(cal_probs, ycal_list, n_cal)
        calibrated = np.empty_like(raw_probs)
        for i, iso in enumerate(calibrators):
            calibrated[i] = iso.transform(raw_probs[i].ravel()).reshape(S, nv_max)
        packed = np.asarray(
            _metrics_from_probs_packed(
                jnp.asarray(calibrated), jnp.asarray(yv_rep), jnp.asarray(wv_rep)
            )
        )
    elif mesh is None:
        # ONE dispatch + ONE fetch: train all folds, evaluate all folds x
        # scenarios, pack metrics + probs into a single result buffer
        eval_args = (jnp.asarray(Xs_stack), jnp.asarray(yv_rep), jnp.asarray(wv_rep))
        if is_moddrop:
            packed = np.asarray(
                _cv_program_moddrop(
                    params_stack, X_stack, y_stack, w_tr, md_args[0], md_args[1],
                    *eval_args, *md_hp,
                )
            )
        else:
            packed = np.asarray(
                _cv_program_fullbatch(
                    params_stack, X_stack, y_stack, w_tr, keys, *eval_args,
                    lr, epochs, dropout, wd,
                )
            )
    else:
        # sharded path: training runs on the mesh; eval follows unsharded
        if is_moddrop:
            trained = _train_folds_moddrop(
                params_stack, X_stack, y_stack, w_tr, md_args[0], md_args[1], *md_hp
            )
        else:
            trained = _train_folds_fullbatch(
                params_stack, X_stack, y_stack, w_tr, keys, lr, epochs, dropout, wd
            )
        packed = np.asarray(
            _eval_folds_scenarios_packed_mlp(
                trained, jnp.asarray(Xs_stack), jnp.asarray(yv_rep), jnp.asarray(wv_rep)
            )
        )
    md, probs = dev_metrics.unpack_metrics_and_probs(packed, (K, S), (K, S, nv_max))

    metrics_all, fold_preds = [], []
    full_obs_idx = next(
        (i for i, s in enumerate(scenarios) if s["name"] == "full_observation"), 0
    )
    for i, (train_df, val_df) in enumerate(folds):
        n_i = len(yva_list[i])
        res = {}
        for si, scenario in enumerate(scenarios):
            m = {k: float(md[k][i, si]) for k in md}
            if group_col and group_col in val_df.columns:
                from pd_fusion.evaluation.evaluate import _subject_metrics

                subj = _subject_metrics(
                    val_df, group_col, yva_list[i].astype(int), probs[i, si, :n_i]
                )
                for kk, vv in subj.items():
                    m[f"subject_{kk}"] = vv
            res[scenario["name"]] = m
        metrics_all.append(res)
        fold_preds.append((yva_list[i], probs[i, full_obs_idx, :n_i]))
    return metrics_all, fold_preds


def _run_parallel_cv_moe(
    config, moe_fold_data, ytr_list, yva_list, scenarios, group_col, folds,
    fold_keys=None, cal_data=None,
):
    """Stacked MoE CV: [K, M, N, Fmax] inputs, vmapped stacked-expert train.

    ``cal_data`` = ((per-fold (Xd_cal, cal_masks)), ycal_list) switches on
    the calibrated flow: one program trains all folds and returns raw
    scenario + calibration-set probs packed, host isotonic per fold maps
    the scenario probs, and a second program computes all K x S metric
    sets from the calibrated probs (2 dispatches + 2 fetches total — the
    same shape as the MLP families' calibrated path)."""
    params_cfg = config["params"]
    K = len(moe_fold_data)
    dims = moe_fold_data[0][2]
    mods = sorted(dims.keys())
    f_max = max(dims.values())
    M = len(mods)

    def stack_dict(Xd, n):
        x = np.zeros((M, n, f_max), np.float32)
        for mi, mod in enumerate(mods):
            Xm = Xd[mod]
            x[mi, :, : Xm.shape[1]] = Xm
        return x

    n_tr_max = max(len(y) for y in ytr_list)
    n_va_max = max(len(y) for y in yva_list)
    S = len(scenarios)

    x_tr = np.zeros((K, M, n_tr_max, f_max), np.float32)
    m_tr = np.zeros((K, n_tr_max, M), np.float32)
    y_tr = np.zeros((K, n_tr_max), np.float32)
    w_tr = np.zeros((K, n_tr_max), np.float32)
    x_va = np.zeros((K, S, M, n_va_max, f_max), np.float32)
    m_va = np.zeros((K, S, n_va_max, M), np.float32)
    y_va = np.zeros((K, S, n_va_max), np.float32)
    w_va = np.zeros((K, S, n_va_max), np.float32)

    for i, (Xd_tr, Xd_va, _, train_masks, val_masks, _) in enumerate(moe_fold_data):
        n_i = len(ytr_list[i])
        x_tr[i, :, :n_i] = stack_dict(Xd_tr, n_i)
        m_tr[i, :n_i] = np.stack([train_masks[m] for m in mods], axis=1)
        y_tr[i, :n_i] = ytr_list[i]
        w_tr[i, :n_i] = 1.0
        nv = len(yva_list[i])
        val_df = folds[i][1]
        for si, scenario in enumerate(scenarios):
            cur = apply_missingness_scenario(val_df, scenario, val_masks)
            mm = np.stack([cur[m] for m in mods], axis=1).astype(np.float32)
            xv = stack_dict(Xd_va, nv)
            # per-modality zeroing of masked inputs (reference evaluate.py:60-62)
            xv = xv * mm.T[:, :, None]
            x_va[i, si, :, :nv] = xv
            m_va[i, si, :nv] = mm
            y_va[i, si, :nv] = yva_list[i]
            w_va[i, si, :nv] = 1.0

    init_keys = jnp.stack(
        [fold_keys[i][0] if fold_keys is not None else fresh_key() for i in range(K)]
    )
    # one program instead of K eager inits (same keys, same draws)
    params_stack = _init_folds_moe(
        init_keys,
        tuple(dims.items()),  # preserve insertion order: draw order matters
        tuple(params_cfg["expert_hidden_dims"]),
        tuple(params_cfg["router_hidden_dims"]),
    )

    hp = (
        float(params_cfg["lr"]),
        int(params_cfg["epochs"]),
        float(params_cfg.get("weight_decay", 0.0)),
    )
    train_args = (
        params_stack,
        jnp.asarray(x_tr),
        jnp.asarray(m_tr),
        jnp.asarray(y_tr),
        jnp.asarray(w_tr),
    )
    if cal_data is not None:
        moe_cal_data, ycal_list = cal_data
        n_cal = [len(y) for y in ycal_list]
        nc_max = max(n_cal)
        x_cal = np.zeros((K, M, nc_max, f_max), np.float32)
        m_cal = np.zeros((K, nc_max, M), np.float32)
        for i, (Xd_cal, cmask) in enumerate(moe_cal_data):
            nc = n_cal[i]
            x_cal[i, :, :nc] = stack_dict(Xd_cal, nc)
            m_cal[i, :nc] = np.stack([cmask[m] for m in mods], axis=1)
        if _use_device_isotonic(ycal_list):
            ycal_j, calmask_j = _pad_cal_targets(ycal_list)
            packed = np.asarray(
                _cv_program_moe_cal(
                    *train_args, jnp.asarray(x_va), jnp.asarray(m_va),
                    jnp.asarray(x_cal), jnp.asarray(m_cal), ycal_j, calmask_j,
                    jnp.asarray(y_va), jnp.asarray(w_va), *hp,
                )
            )  # ONE dispatch + ONE fetch incl. the isotonic calibration
        else:
            buf = np.asarray(
                _cv_program_moe_probs(
                    *train_args, jnp.asarray(x_va), jnp.asarray(m_va),
                    jnp.asarray(x_cal), jnp.asarray(m_cal), *hp,
                )
            )
            raw_probs = buf[:, : S * n_va_max].reshape(K, S, n_va_max)
            cal_probs = buf[:, S * n_va_max:]
            calibrators = _fit_isotonic_per_fold(cal_probs, ycal_list, n_cal)
            calibrated = np.empty_like(raw_probs)
            for i, iso in enumerate(calibrators):
                calibrated[i] = iso.transform(raw_probs[i].ravel()).reshape(S, n_va_max)
            packed = np.asarray(
                _metrics_from_probs_packed(
                    jnp.asarray(calibrated), jnp.asarray(y_va), jnp.asarray(w_va)
                )
            )
    else:
        packed = np.asarray(
            _cv_program_moe(
                *train_args,
                jnp.asarray(x_va),
                jnp.asarray(m_va),
                jnp.asarray(y_va),
                jnp.asarray(w_va),
                *hp,
            )
        )  # ONE dispatch + ONE fetch for the whole MoE CV
    md, probs = dev_metrics.unpack_metrics_and_probs(packed, (K, S), (K, S, n_va_max))

    metrics_all, fold_preds = [], []
    full_obs_idx = next(
        (i for i, s in enumerate(scenarios) if s["name"] == "full_observation"), 0
    )
    for i in range(K):
        val_df = folds[i][1]
        nv = len(yva_list[i])
        res = {}
        for si, scenario in enumerate(scenarios):
            m = {k: float(md[k][i, si]) for k in md}
            if group_col and group_col in val_df.columns:
                from pd_fusion.evaluation.evaluate import _subject_metrics

                subj = _subject_metrics(val_df, group_col, yva_list[i].astype(int), probs[i, si, :nv])
                for kk, vv in subj.items():
                    m[f"subject_{kk}"] = vv
            res[scenario["name"]] = m
        metrics_all.append(res)
        fold_preds.append((yva_list[i], probs[i, full_obs_idx, :nv]))
    return metrics_all, fold_preds




# ---------------------------------------------------------------------------
# MIL attention (precomputed bags) — one-program K-fold CV
# ---------------------------------------------------------------------------
#
# The sequential path trains one MilAttentionModel per fold and loops
# scenario predictions (models/mil_attention.py; reference :88-155,
# :255-278). Here: bags pad to ONE static (n, L, D) shape shared by every
# fold (cross-fold padding rows carry zero loss weight — exact no-ops),
# a single vmapped program trains all K models AND predicts the val and
# calibration bags, and scenario assembly (missing bag or dropped mri
# modality -> the constant missing_prob) happens on host from the one
# fetched prob matrix: MIL's scenario structure needs no per-scenario
# device pass. Metrics for all K x S cells then come from one packed
# device reduction. Total: 2 dispatches + 2 fetches for the entire
# calibrated MIL CV.


def gbdt_device_backend(config) -> bool:
    """True when the unimodal_gbdt model resolves to the TPU-native
    trainer (nn.gbdt.resolve_gbdt_backend: 'auto' default picks device
    on TPU, host on CPU; params/env force either); only then is the fold
    axis vmappable — the host HistGB/lightgbm backends stay on the
    sequential per-fold loop."""
    from pd_fusion.nn.gbdt import resolve_gbdt_backend

    return resolve_gbdt_backend(config.get("params", {}).get("backend")) == "device"


def _run_parallel_cv_gbdt(
    config, folds, masks, scenarios, group_col, calib_dfs, do_calibrate, fold_masks
):
    """Stacked device-GBDT CV: per-fold host binning (quantile edges fit
    on each fold's own scaled train matrix — no leakage, mirroring the
    sequential DeviceHistGBDT.fit), then ONE program trains all folds'
    ensembles and evaluates all folds x scenarios. Padding rows carry
    zero sample-weight, which the trainer provably ignores
    (tests/test_device_gbdt.py::test_zero_weight_rows_are_invisible).
    Sequential-path semantics mirrored: scenario inputs are the scaled
    val matrix with masked modality blocks zeroed THEN re-binned with the
    fold's edges (evaluate.predict_for_masks), calibration inputs are the
    raw un-zeroed matrix."""
    from pd_fusion.nn.gbdt import (
        DeviceHistGBDT,
        bin_features,
        compute_base_score,
        fit_bin_edges,
        resolve_hist_mode,
    )

    params_cfg = {k: v for k, v in config["params"].items() if k != "backend"}
    from pd_fusion.models.unimodal_gbdt import _DEVICE_PARAM_KEYS

    proto = DeviceHistGBDT(
        **{k: v for k, v in params_cfg.items() if k in _DEVICE_PARAM_KEYS}
    )
    modality = config.get("modality", "clinical")
    feat_cols = get_modality_feature_cols(folds[0][0], modality)
    if not feat_cols:
        raise ValueError("No feature columns for parallel GBDT CV.")
    assign = feature_modality_matrix(feat_cols)
    K, S = len(folds), len(scenarios)

    bins_tr_list, y_tr_list, bases = [], [], []
    bins_scen_list, yva_list = [], []
    bins_cal_list, ycal_list = [], []
    for fi, (train_df, val_df) in enumerate(folds):
        if fold_masks is not None:
            train_masks, val_masks = fold_masks[fi]
        else:
            train_masks = get_subset_masks(masks, train_df.index)
            val_masks = get_subset_masks(masks, val_df.index)
        X_tr, _, scaler = preprocess_features(train_df, feat_cols)
        X_va_raw, _, _ = preprocess_features(val_df, feat_cols, None, scaler)
        X_tr = X_tr.astype(np.float32)
        edges = fit_bin_edges(X_tr)
        bins_tr_list.append(bin_features(X_tr, edges))
        y = train_df[TARGET_COL].values.astype(np.float32)
        y_tr_list.append(y)
        bases.append(compute_base_score(y))
        scen_b = []
        for scenario in scenarios:
            cur = apply_missingness_scenario(val_df, scenario, val_masks)
            mm = get_modality_mask_matrix(cur).astype(np.float32)
            Xs = apply_modality_masks_np(X_va_raw, mm, assign)
            scen_b.append(bin_features(Xs.astype(np.float32), edges))
        bins_scen_list.append(np.stack(scen_b))  # [S, Nv, F]
        yva_list.append(val_df[TARGET_COL].values.astype(np.float32))
        if do_calibrate:
            if calib_dfs[fi] is not None:
                calib_df = calib_dfs[fi]
                X_cal, _, _ = preprocess_features(calib_df, feat_cols, None, scaler)
                ycal_list.append(calib_df[TARGET_COL].values.astype(np.float32))
            else:
                X_cal = X_va_raw
                ycal_list.append(yva_list[-1])
            bins_cal_list.append(bin_features(X_cal.astype(np.float32), edges))

    f_dim = len(feat_cols)
    n_max = max(len(y) for y in y_tr_list)
    bins_tr = np.zeros((K, n_max, f_dim), np.int32)
    y_tr = np.zeros((K, n_max), np.float32)
    w_tr = np.zeros((K, n_max), np.float32)
    for i, (b, y) in enumerate(zip(bins_tr_list, y_tr_list)):
        bins_tr[i, : len(y)] = b
        y_tr[i, : len(y)] = y
        w_tr[i, : len(y)] = 1.0

    nv_max = max(len(y) for y in yva_list)
    bins_va = np.zeros((K, S, nv_max, f_dim), np.int32)
    for i, a in enumerate(bins_scen_list):
        bins_va[i, :, : a.shape[1]] = a
    yv_stack, wv = _pad_stack([y[:, None] for y in yva_list])
    yv_rep = np.repeat(yv_stack[..., 0][:, None, :], S, axis=1)
    wv_rep = np.repeat(wv[:, None, :], S, axis=1)

    hp = dict(
        n_rounds=proto.n_estimators,
        depth=proto.max_depth,
        lr=proto.learning_rate,
        lam=proto.reg_lambda,
        mcw=proto.min_child_weight,
        mcs=proto.min_child_samples,
        hist_mode=resolve_hist_mode(proto.hist_mode),
    )
    base_arr = jnp.asarray(np.array(bases, np.float32))

    # multi-chip: shard the fold and train-batch axes over the
    # ("fold", "data") mesh like the MLP families — the per-level
    # histogram reductions then psum over the data axis (sharded ==
    # single-device equivalence asserted in __graft_entry__.dryrun_
    # multichip and tests/test_multichip.py)
    bins_tr_j, y_tr_j, w_tr_j = jnp.asarray(bins_tr), jnp.asarray(y_tr), jnp.asarray(w_tr)
    bins_va_j = jnp.asarray(bins_va)
    mesh = _cv_mesh(K, n_max) if config.get("cv_mesh", "auto") != "off" else None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        fold_batch = NamedSharding(mesh, P("fold", "data"))
        fold_only = NamedSharding(mesh, P("fold"))
        bins_tr_j = jax.device_put(bins_tr_j, fold_batch)
        y_tr_j = jax.device_put(y_tr_j, fold_batch)
        w_tr_j = jax.device_put(w_tr_j, fold_batch)
        base_arr = jax.device_put(base_arr, fold_only)
        bins_va_j = jax.device_put(bins_va_j, fold_only)
        logger.info(
            f"parallel GBDT CV sharded over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}"
        )

    if do_calibrate:
        nc_max = max(len(y) for y in ycal_list)
        bins_cal = np.zeros((K, nc_max, f_dim), np.int32)
        for i, b in enumerate(bins_cal_list):
            bins_cal[i, : b.shape[0]] = b
        bins_cal_j = jnp.asarray(bins_cal)
        if mesh is not None:
            bins_cal_j = jax.device_put(bins_cal_j, fold_only)
        if _use_device_isotonic(ycal_list):
            ycal_j, calmask_j = _pad_cal_targets(ycal_list)
            yv_j, wv_j = jnp.asarray(yv_rep), jnp.asarray(wv_rep)
            if mesh is not None:
                ycal_j = jax.device_put(ycal_j, fold_only)
                calmask_j = jax.device_put(calmask_j, fold_only)
                yv_j = jax.device_put(yv_j, fold_only)
                wv_j = jax.device_put(wv_j, fold_only)
            packed = np.asarray(
                _cv_program_gbdt_cal(
                    bins_tr_j, y_tr_j, w_tr_j, base_arr, bins_va_j, bins_cal_j,
                    ycal_j, calmask_j, yv_j, wv_j, **hp,
                )
            )  # ONE dispatch + ONE fetch incl. the isotonic calibration
        else:
            buf = np.asarray(
                _cv_program_gbdt_probs(
                    bins_tr_j, y_tr_j, w_tr_j, base_arr, bins_va_j, bins_cal_j, **hp,
                )
            )
            raw_probs = buf[:, : S * nv_max].reshape(K, S, nv_max)
            cal_probs = buf[:, S * nv_max:]
            n_cal = [len(y) for y in ycal_list]
            calibrators = _fit_isotonic_per_fold(cal_probs, ycal_list, n_cal)
            calibrated = np.empty_like(raw_probs)
            for i, iso in enumerate(calibrators):
                calibrated[i] = iso.transform(raw_probs[i].ravel()).reshape(S, nv_max)
            packed = np.asarray(
                _metrics_from_probs_packed(
                    jnp.asarray(calibrated), jnp.asarray(yv_rep), jnp.asarray(wv_rep)
                )
            )
    else:
        yv_j, wv_j = jnp.asarray(yv_rep), jnp.asarray(wv_rep)
        if mesh is not None:
            yv_j = jax.device_put(yv_j, fold_only)
            wv_j = jax.device_put(wv_j, fold_only)
        packed = np.asarray(
            _cv_program_gbdt(
                bins_tr_j, y_tr_j, w_tr_j, base_arr, bins_va_j, yv_j, wv_j, **hp,
            )
        )
    md, probs = dev_metrics.unpack_metrics_and_probs(packed, (K, S), (K, S, nv_max))

    metrics_all, fold_preds = [], []
    full_obs_idx = next(
        (i for i, s in enumerate(scenarios) if s["name"] == "full_observation"), 0
    )
    for i, (train_df, val_df) in enumerate(folds):
        n_i = len(yva_list[i])
        res = {}
        for si, scenario in enumerate(scenarios):
            m = {k: float(md[k][i, si]) for k in md}
            if group_col and group_col in val_df.columns:
                from pd_fusion.evaluation.evaluate import _subject_metrics

                subj = _subject_metrics(
                    val_df, group_col, yva_list[i].astype(int), probs[i, si, :n_i]
                )
                for kk, vv in subj.items():
                    m[f"subject_{kk}"] = vv
            res[scenario["name"]] = m
        metrics_all.append(res)
        fold_preds.append((yva_list[i], probs[i, full_obs_idx, :n_i]))
    return metrics_all, fold_preds


@lru_cache(maxsize=None)
def _mil_init_program(input_dim, hidden_dim, attn_dim, gated):
    from pd_fusion.nn.mil import mil_init

    return jax.jit(jax.vmap(
        lambda k: mil_init(k, input_dim, hidden_dim, attn_dim, gated)
    ))


@lru_cache(maxsize=None)
def _mil_cv_program_factory(lr, epochs, batch_size, gated, dropout, weight_decay,
                            use_clip, track_best, patience, missing_prob):
    # cached on the static hyperparams: a multi-seed sweep re-enters with
    # identical values and must reuse the jitted program instead of
    # retracing (a fresh jit object defeats jax's compile cache lookup
    # cost and burns a 30-60 s relay compile per call on cache misses)
    from pd_fusion.nn.mil import mil_apply, train_mil_impl

    @jax.jit
    def program(params_stack, X, bm, y, w_row, Xt, mt, yt, wt, vt, Xv, mv, Xc, mc,
                keys, pos_weight, max_grad_norm):
        def one_fold(p0, x, b, yy, wr, xt, mtt, ytt, wtt, vtt, xv, mvv, xc, mcc, k, pw, gn):
            trained = train_mil_impl(
                p0, x, b, yy, wr, xt, mtt, ytt, wtt, k, lr, pw, gn, epochs,
                batch_size, gated, dropout, weight_decay, use_clip, track_best,
                patience, vmiss=vtt, missing_prob=missing_prob,
            )
            pv = jax.nn.sigmoid(mil_apply(trained, xv, mvv, gated=gated))
            pc = jax.nn.sigmoid(mil_apply(trained, xc, mcc, gated=gated))
            return jnp.concatenate([pv, pc])

        return jax.vmap(one_fold)(
            params_stack, X, bm, y, w_row, Xt, mt, yt, wt, vt, Xv, mv, Xc, mc,
            keys, pos_weight, max_grad_norm,
        )

    return program


def _pad_kept_bags(bags, keep, max_len, input_dim, width):
    """Pad the kept bags of one fold into fixed [width, max_len, D] (+mask)."""
    from pd_fusion.nn.mil import pad_bags

    X = np.zeros((width, max_len, input_dim), np.float32)
    M = np.zeros((width, max_len), np.float32)
    if keep:
        xb, mb = pad_bags([np.asarray(bags[j], np.float32) for j in keep], max_len)
        X[: len(keep)], M[: len(keep)] = xb, mb
    return X, M


def _assemble_mil_scenario_probs(fold_rows, kept_probs, scenarios, missing_prob):
    """Per-scenario probability vectors from the single kept-bag prob
    fetch: a subject predicts missing_prob when its bag is absent OR the
    scenario drops / the natural mask zeroes the mri modality
    (MilAttentionModel.predict_proba semantics)."""
    K = len(fold_rows)
    S = len(scenarios)
    nv_max = max(len(r["y_va"]) for r in fold_rows)
    probs = np.full((K, S, nv_max), missing_prob, np.float32)
    yv = np.zeros((K, S, nv_max), np.float32)
    wv = np.zeros((K, S, nv_max), np.float32)
    for i, r in enumerate(fold_rows):
        nv = len(r["y_va"])
        pos_of = {row: slot for slot, row in enumerate(r["keep_va"])}
        for si, scenario in enumerate(scenarios):
            cur = apply_missingness_scenario(r["val_df"], scenario, r["val_masks"])
            mri = cur.get("mri")
            vec = np.full(nv, missing_prob, np.float32)
            for row, slot in pos_of.items():
                if mri is None or mri[row] != 0:
                    vec[row] = kept_probs[i, slot]
            probs[i, si, :nv] = vec
            yv[i, si, :nv] = r["y_va"]
            wv[i, si, :nv] = 1.0
    return probs, yv, wv, nv_max


def _run_parallel_cv_mil(config, folds, masks, scenarios, group_col, calib_dfs,
                         do_calibrate, nested, fold_masks, fold_keys):
    if fold_masks is not None:
        raise ValueError("parallel MIL CV does not support explicit fold_masks")
    params_cfg = config["params"]
    mil_col = config.get("mil_column", "mri_mil")
    K = len(folds)
    missing_prob = float(params_cfg.get("missing_prob", 0.5))
    gated = bool(params_cfg.get("gated", False))
    patience = int(params_cfg.get("early_stopping_patience", 0))
    max_grad_norm = params_cfg.get("max_grad_norm")
    track_best = patience > 0

    # ---- collect per-fold bag sets --------------------------------------
    fold_rows = []
    bag_dims, bag_lens, tr_lens = set(), [], []
    for fi, (train_df, val_df) in enumerate(folds):
        val_masks = get_subset_masks(masks, val_df.index)
        bags_tr = train_df[mil_col].tolist()
        keep_tr = [j for j, b in enumerate(bags_tr) if b is not None]
        bags_va = val_df[mil_col].tolist()
        keep_va = [j for j, b in enumerate(bags_va) if b is not None]

        if do_calibrate and nested:
            calib_df = calib_dfs[fi]
            calib_masks = get_subset_masks(masks, calib_df.index)
            bags_cal = calib_df[mil_col].tolist()
            keep_cal = [j for j, b in enumerate(bags_cal) if b is not None]
            y_cal = calib_df[TARGET_COL].values.astype(np.float32)
            cal_mri = calib_masks.get("mri")
        else:
            bags_cal, keep_cal = bags_va, keep_va
            y_cal = val_df[TARGET_COL].values.astype(np.float32)
            cal_mri = val_masks.get("mri")

        for src, kp in ((bags_tr, keep_tr), (bags_va, keep_va), (bags_cal, keep_cal)):
            for j in kp:
                b = np.asarray(src[j])
                bag_lens.append(b.shape[0])
                bag_dims.add(b.shape[1])
                if src is bags_tr:
                    tr_lens.append(b.shape[0])

        fold_rows.append({
            "bags_tr": [np.asarray(bags_tr[j], np.float32) for j in keep_tr],
            "y_tr": train_df[TARGET_COL].values.astype(np.float32)[keep_tr],
            "bags_va": bags_va, "keep_va": keep_va,
            "y_va": val_df[TARGET_COL].values.astype(np.float32),
            "val_masks": val_masks, "val_df": val_df,
            "bags_cal": bags_cal, "keep_cal": keep_cal, "y_cal": y_cal,
            "cal_mri": cal_mri,
        })

    if len(bag_dims) != 1:
        raise ValueError(f"inconsistent MIL bag feature dims: {bag_dims}")
    input_dim = bag_dims.pop()
    if "max_len" in params_cfg:
        # matches MilAttentionModel.train: a configured max_len that
        # would truncate TRAINING bags raises (static shapes need a
        # correct bound); val/cal bags longer than it just widen the
        # shared pad — the reference pads per-batch and never truncates.
        max_len = int(params_cfg["max_len"])
        if tr_lens and max_len < max(tr_lens):
            raise ValueError(
                f"config max_len={max_len} would truncate training bags "
                f"(longest bag has {max(tr_lens)} instances)"
            )
        max_len = max(max_len, ((max(bag_lens) + 7) // 8) * 8)
    else:
        max_len = ((max(bag_lens) + 7) // 8) * 8  # TPU sublane alignment

    n_tr = [len(r["bags_tr"]) for r in fold_rows]
    n_tr_max = max(n_tr)
    nv_w = max(max(len(r["keep_va"]) for r in fold_rows), 1)
    nc_w = max(max(len(r["keep_cal"]) for r in fold_rows), 1) if do_calibrate else 1
    # the sequential path uses min(batch_size, n_real) PER FOLD; the
    # shared static program takes the smallest fold's value (identical
    # whenever folds are equal-sized). Floor of 1: a fold with zero kept
    # training bags would otherwise make this 0 and crash the ceil-div in
    # train_mil_impl (such a fold trains as a no-op — all-zero weights)
    batch_size = max(1, min(int(params_cfg.get("batch_size", 16)), min(n_tr)))

    X = np.zeros((K, n_tr_max, max_len, input_dim), np.float32)
    BM = np.zeros((K, n_tr_max, max_len), np.float32)
    Y = np.zeros((K, n_tr_max), np.float32)
    WR = np.zeros((K, n_tr_max), np.float32)
    XV = np.zeros((K, nv_w, max_len, input_dim), np.float32)
    MV = np.zeros((K, nv_w, max_len), np.float32)
    XC = np.zeros((K, nc_w, max_len, input_dim), np.float32)
    MC = np.zeros((K, nc_w, max_len), np.float32)
    pos_w = np.ones((K,), np.float32)

    for i, r in enumerate(fold_rows):
        xt, mt = _pad_kept_bags(r["bags_tr"], list(range(n_tr[i])), max_len, input_dim, n_tr_max)
        X[i], BM[i] = xt, mt
        Y[i, : n_tr[i]] = r["y_tr"]
        WR[i, : n_tr[i]] = 1.0
        XV[i], MV[i] = _pad_kept_bags(r["bags_va"], r["keep_va"], max_len, input_dim, nv_w)
        if do_calibrate:
            XC[i], MC[i] = _pad_kept_bags(r["bags_cal"], r["keep_cal"], max_len, input_dim, nc_w)
        if params_cfg.get("class_weight") == "balanced":
            pos = float((r["y_tr"] == 1).sum())
            neg = float((r["y_tr"] == 0).sum())
            pos_w[i] = neg / pos if pos > 0 else 1.0
        elif params_cfg.get("pos_weight") is not None:
            pos_w[i] = float(params_cfg["pos_weight"])

    # early-stopping tracking set per fold: the frame the sequential
    # train_pipeline passes as val_data (calib split when nested, else
    # the val fold). ALL rows of that frame enter the per-epoch AUC —
    # the reference scores it through predict_proba, so a missing (None)
    # bag contributes the constant missing_prob with its true label
    # (reference mil_attention.py:139-143 + 169-172); the VT flags mark
    # those rows and train_mil_impl overrides their probs.
    if track_best and nested:
        frames = [(r["bags_cal"], r["y_cal"]) for r in fold_rows]
    else:
        frames = [(r["bags_va"], r["y_va"]) for r in fold_rows]
    if track_best:
        nt_w = max(max(len(yf) for _, yf in frames), 1)
        Xt = np.zeros((K, nt_w, max_len, input_dim), np.float32)
        # all-ones mask on missing/padding rows: finite logits through
        # the masked softmax (missing rows are overridden via VT; padding
        # rows carry Wt == 0 and are excluded from the weighted AUC)
        Mt = np.ones((K, nt_w, max_len), np.float32)
        Yt = np.zeros((K, nt_w), np.float32)
        Wt = np.zeros((K, nt_w), np.float32)
        VT = np.zeros((K, nt_w), np.float32)
        for i, (bags_t, y_t) in enumerate(frames):
            nt = len(y_t)
            keep = [j for j, b in enumerate(bags_t) if b is not None]
            if keep:
                xk, mk = _pad_kept_bags(bags_t, keep, max_len, input_dim, len(keep))
                Xt[i, keep], Mt[i, keep] = xk, mk
            for j in range(nt):
                VT[i, j] = 0.0 if bags_t[j] is not None else 1.0
            Yt[i, :nt] = y_t
            Wt[i, :nt] = 1.0
    else:
        # unused by the program when track_best is static False
        nt_w = 1
        Xt = np.zeros((K, 1, max_len, input_dim), np.float32)
        Mt = np.ones((K, 1, max_len), np.float32)
        Yt = np.zeros((K, 1), np.float32)
        Wt = np.zeros((K, 1), np.float32)
        VT = np.zeros((K, 1), np.float32)

    # interleaved (init, train) key draws per fold = the sequential
    # loop's consumption order of the global chain
    if fold_keys is not None:
        drawn = [(fold_keys[i][0], fold_keys[i][1]) for i in range(K)]
    else:
        drawn = [(fresh_key(), fresh_key()) for _ in range(K)]
    init_keys = jnp.stack([a for a, _ in drawn])
    train_keys = jnp.stack([b for _, b in drawn])
    params_stack = _mil_init_program(
        input_dim, int(params_cfg.get("hidden_dim", 128)),
        int(params_cfg.get("attn_dim", 64)), gated,
    )(init_keys)

    program = _mil_cv_program_factory(
        float(params_cfg.get("lr", 1e-3)), int(params_cfg.get("epochs", 30)),
        batch_size, gated, float(params_cfg.get("dropout", 0.3)),
        float(params_cfg.get("weight_decay", 0.0)), bool(max_grad_norm), track_best,
        patience if track_best else 0, missing_prob,
    )
    buf = np.asarray(program(
        params_stack, jnp.asarray(X), jnp.asarray(BM), jnp.asarray(Y), jnp.asarray(WR),
        jnp.asarray(Xt), jnp.asarray(Mt), jnp.asarray(Yt), jnp.asarray(Wt),
        jnp.asarray(VT), jnp.asarray(XV), jnp.asarray(MV), jnp.asarray(XC),
        jnp.asarray(MC), train_keys, jnp.asarray(pos_w),
        jnp.asarray(np.full(K, float(max_grad_norm or 1.0), np.float32)),
    ))
    kept_val_probs = buf[:, :nv_w]
    kept_cal_probs = buf[:, nv_w:]

    probs, yv, wv, nv_max = _assemble_mil_scenario_probs(
        fold_rows, kept_val_probs, scenarios, missing_prob
    )

    if do_calibrate:
        # calibration-set probs assembled the same way predict_proba
        # would (missing bags / masked mri -> missing_prob constants)
        calibrators = []
        from sklearn.isotonic import IsotonicRegression

        for i, r in enumerate(fold_rows):
            nc = len(r["y_cal"])
            vec = np.full(nc, missing_prob, np.float32)
            for slot, row in enumerate(r["keep_cal"]):
                if r["cal_mri"] is None or r["cal_mri"][row] != 0:
                    vec[row] = kept_cal_probs[i, slot]
            iso = IsotonicRegression(out_of_bounds="clip")
            iso.fit(vec, r["y_cal"])
            calibrators.append(iso)
        for i, iso in enumerate(calibrators):
            probs[i] = iso.transform(probs[i].ravel()).reshape(probs[i].shape)

    packed = np.asarray(
        _metrics_from_probs_packed(jnp.asarray(probs), jnp.asarray(yv), jnp.asarray(wv))
    )
    S = len(scenarios)
    md, probs_out = dev_metrics.unpack_metrics_and_probs(packed, (K, S), (K, S, nv_max))

    metrics_all, fold_preds = [], []
    full_obs_idx = next(
        (i for i, s in enumerate(scenarios) if s["name"] == "full_observation"), 0
    )
    for i, r in enumerate(fold_rows):
        nv = len(r["y_va"])
        res = {}
        for si, scenario in enumerate(scenarios):
            m = {k: float(md[k][i, si]) for k in md}
            if group_col and group_col in r["val_df"].columns:
                from pd_fusion.evaluation.evaluate import _subject_metrics

                subj = _subject_metrics(
                    r["val_df"], group_col, r["y_va"].astype(int), probs_out[i, si, :nv]
                )
                for kk, vv in subj.items():
                    m[f"subject_{kk}"] = vv
            res[scenario["name"]] = m
        metrics_all.append(res)
        fold_preds.append((r["y_va"], probs_out[i, full_obs_idx, :nv]))
    return metrics_all, fold_preds

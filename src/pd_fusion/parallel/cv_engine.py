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
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pd_fusion.data.feature_utils import (
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
from pd_fusion.ops import metrics as dev_metrics
from pd_fusion.utils.seed import fresh_key

PARALLEL_CV_FAMILIES = {"fusion_late", "fusion_masked", "fusion_moddrop", "unimodal_mlp", "moe"}

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
            return jnp.sum(l * ww) / jnp.maximum(jnp.sum(ww), 1e-38)

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


@jax.jit
def _eval_folds_scenarios_packed_mlp(params_stack, X_scen, y, w):
    """predict + all metrics + pack into ONE buffer: a single device
    program whose single output array is fetched with one relay round
    trip (fetching the 6 metric arrays + probs separately costs ~1 s of
    pure readback latency at ~140 ms/fetch)."""
    probs = jax.vmap(
        lambda p, xs: jax.vmap(lambda x: jax.nn.sigmoid(mlp_apply(p, x)))(xs)
    )(params_stack, X_scen)
    md = jax.vmap(jax.vmap(dev_metrics.binary_metrics))(y, probs, w)
    return dev_metrics.pack_metrics_and_probs(md, probs)


def _packed_mlp_eval(trained, Xs, yv, wv):
    probs = jax.vmap(
        lambda p, xs: jax.vmap(lambda x: jax.nn.sigmoid(mlp_apply(p, x)))(xs)
    )(trained, Xs)
    md = jax.vmap(jax.vmap(dev_metrics.binary_metrics))(yv, probs, wv)
    return dev_metrics.pack_metrics_and_probs(md, probs)


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
    if config.get("calibrate", False) or config.get("nested_calibration", False):
        return False  # calibration needs the sequential per-fold wrap
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

    Xtr_list, ytr_list, Xva_scen_list, yva_list, scalers = [], [], [], [], []
    val_mask_rows = []  # per fold per scenario mask matrices (for masked fusion)
    moe_fold_data = []

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
            continue

        X_tr, _, scaler = preprocess_features(train_df, feat_cols)
        X_va_raw, _, _ = preprocess_features(val_df, feat_cols, None, scaler)
        scalers.append(scaler)

        if model_type == "fusion_masked":
            tr_mm = get_modality_mask_matrix(train_masks).astype(np.float32)
            X_tr = np.concatenate([X_tr, tr_mm], axis=1)

        Xtr_list.append(X_tr.astype(np.float32))
        ytr_list.append(train_df[TARGET_COL].values.astype(np.float32))

        # scenario-transformed eval inputs for this fold
        assign = feature_modality_matrix(feat_cols)
        scen_X = []
        scen_mm = []
        for scenario in scenarios:
            cur = apply_missingness_scenario(val_df, scenario, val_masks)
            mm = get_modality_mask_matrix(cur).astype(np.float32)
            keep = 1.0 - assign @ (1.0 - mm.T)  # [F, N]
            Xs = X_va_raw * keep.T
            if model_type == "fusion_masked":
                Xs = np.concatenate([Xs, mm], axis=1)
            scen_X.append(Xs.astype(np.float32))
            scen_mm.append(mm)
        Xva_scen_list.append(np.stack(scen_X))  # [S, Nv, F']
        val_mask_rows.append(scen_mm)
        yva_list.append(val_df[TARGET_COL].values.astype(np.float32))

    lr = float(params_cfg["lr"])
    epochs = int(params_cfg["epochs"])
    dropout = float(params_cfg.get("dropout", 0.2))
    wd = float(params_cfg.get("weight_decay", 0.0))

    if model_type == "moe":
        return _run_parallel_cv_moe(
            config, moe_fold_data, ytr_list, yva_list, scenarios, group_col, folds,
            fold_keys=fold_keys,
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
        init_keys = jnp.stack([fresh_key() for _ in range(K)])
        keys = jnp.stack([fresh_key() for _ in range(K)])
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
            min(int(params_cfg.get("batch_size", 32)), X_stack.shape[1]),
            dropout,
            wd,
            float(params_cfg.get("moddrop_rate", 0.2)),
            bool(params_cfg.get("moddrop_per_sample", False)),
        )

    if mesh is None:
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
    config, moe_fold_data, ytr_list, yva_list, scenarios, group_col, folds, fold_keys=None
):
    """Stacked MoE CV: [K, M, N, Fmax] inputs, vmapped stacked-expert train."""
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

    packed = np.asarray(
        _cv_program_moe(
            params_stack,
            jnp.asarray(x_tr),
            jnp.asarray(m_tr),
            jnp.asarray(y_tr),
            jnp.asarray(w_tr),
            jnp.asarray(x_va),
            jnp.asarray(m_va),
            jnp.asarray(y_va),
            jnp.asarray(w_va),
            float(params_cfg["lr"]),
            int(params_cfg["epochs"]),
            float(params_cfg.get("weight_decay", 0.0)),
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

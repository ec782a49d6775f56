"""TPU-native histogram gradient-boosted trees (binary logistic loss).

The reference's GBDT component is a LightGBM wrapper
(reference src/pd_fusion/models/unimodal_gbdt.py:6-26; fallback chain
lgbm -> xgboost -> HistGradientBoosting in
reference scripts/ppmi_train_tabular.py:109-142). lightgbm/xgboost are
absent in this image, so the shipped default backend is sklearn's
HistGB (host CPU). This module is the TPU-first redesign of the same
algorithm family: LightGBM-style quantile-binned histogram boosting,
expressed as ONE compiled XLA program.

Design (deliberately not a port — tree boosting has no reference GPU/TPU
code to port):

- **Host/device split**: quantile bin-edge fitting and feature binning
  are tiny host-side numpy (done once); everything per-boosting-round —
  gradients, per-node histograms, split search, sample routing, leaf
  values, margin update — is device-side XLA inside a single
  ``lax.scan`` over rounds.
- **Static shapes**: trees grow depth-wise to a fixed ``depth`` (the
  2^(depth) leaf budget mirrors LightGBM's default num_leaves=31 at
  depth 5). Nodes that find no beneficial split emit a pass-through
  split (threshold = MISSING_BIN, everything routed left), which is
  numerically identical to stopping early: the surviving child inherits
  the parent's gradient stats, so the final leaf value equals the value
  the parent would have emitted.
- **Histograms as one segment-sum**: per level, the (node, feature, bin)
  histogram of (g, h, weight) is a single ``segment_sum`` over N*F
  flattened indices — O(N*F) scatter-adds, the sparse formulation (an
  MXU one-hot matmul would do 2*N*L*B flops per feature; at depth 6
  that is ~100x more arithmetic than the scatter moves bytes).
- **Missing values**: NaN/inf gets a reserved bin; split search
  evaluates both "missing goes left" and "missing goes right"
  directions (LightGBM's learned default direction) by offsetting the
  cumulative histograms.
- **vmap-ready**: ``train_gbdt`` is a pure function of
  ``(bins, y, w)`` with static hyperparameters, so a leading fold axis
  vmaps the whole K-fold CV into one program (same pattern as
  pd_fusion.nn.trainer / parallel.cv_engine).

Gain/leaf formulas are the standard second-order ones (XGBoost/LightGBM):
gain = 1/2 [GL^2/(HL+lam) + GR^2/(HR+lam) - G^2/(H+lam)], leaf value
-lr * G/(H+lam), boosting from the base log-odds of the weighted label
mean (LightGBM boost_from_average).
"""
import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

N_BINS = 256  # total codes per feature
MISSING_BIN = N_BINS - 1  # reserved code for NaN/inf
N_VALUE_BINS = N_BINS - 1  # ordered (splittable) value bins: 0..254


# --------------------------------------------------------------------------
# Host-side binning (fit once, numpy)
# --------------------------------------------------------------------------

def fit_bin_edges(X: np.ndarray, max_value_bins: int = N_VALUE_BINS) -> List[np.ndarray]:
    """Per-feature ascending quantile edges (<= max_value_bins-1 of them).

    Bin convention: bin i holds values in (edges[i-1], edges[i]], bin 0 is
    (-inf, edges[0]]; a split "bin <= t" therefore means value <= edges[t].
    Non-finite values are not binned here (they get MISSING_BIN).
    """
    X = np.asarray(X, np.float32)
    edges = []
    qs = np.linspace(0.0, 1.0, max_value_bins)[1:-1]
    for j in range(X.shape[1]):
        col = X[:, j]
        finite = col[np.isfinite(col)]
        if finite.size == 0:
            edges.append(np.zeros(0, np.float32))
            continue
        e = np.unique(np.quantile(finite, qs).astype(np.float32))
        edges.append(e)
    return edges


def bin_features(X: np.ndarray, edges: List[np.ndarray]) -> np.ndarray:
    """Map raw features to int32 bin codes using fitted edges."""
    X = np.asarray(X, np.float32)
    out = np.empty(X.shape, np.int32)
    for j, e in enumerate(edges):
        col = X[:, j]
        finite = np.isfinite(col)
        # first index i with edges[i] >= v  ->  v in (edges[i-1], edges[i]]
        codes = np.searchsorted(e, col, side="left").astype(np.int32)
        out[:, j] = np.where(finite, codes, MISSING_BIN)
    return out


# --------------------------------------------------------------------------
# Device-side training
# --------------------------------------------------------------------------

def resolve_gbdt_backend(setting: Optional[str]) -> str:
    """Resolve a GBDT backend setting to 'device' or 'host'.

    ``backend: auto`` (the default since round 5) picks the TPU-native
    trainer on an accelerator backend and the host chain
    (lgbm -> xgboost -> HistGB) on CPU, per the live TPU A/B
    (PARITY sessions O/P, scripts/ab_gbdt_tpu.py): device+onehot beats
    HistGB ~2x per fit at N=20000 and 3.3x at the bench leg's N=500,
    while the 1-core host CPU prefers sklearn's C loops. Explicit
    'device'/'host' settings and the PD_FUSION_GBDT_BACKEND env var
    (highest precedence) force either side; AUC parity between the two
    is pinned in tests/test_device_gbdt.py.
    """
    env = os.environ.get("PD_FUSION_GBDT_BACKEND", "")
    if env in ("device", "host"):
        return env
    if setting == "device":
        return "device"
    if setting in ("host", "histgb", "lightgbm", "xgboost"):
        return "host"
    if setting not in (None, "", "auto"):
        raise ValueError(
            f"unknown GBDT backend {setting!r} (use 'device', 'host', or 'auto')"
        )
    return "device" if jax.default_backend() == "tpu" else "host"


def resolve_hist_mode(mode: Optional[str]) -> str:
    """Resolve a hist_mode setting ('scatter' | 'onehot' | 'auto'/None)
    to a concrete lowering for the active backend.

    Measured on the real TPU v5e (scripts/ab_gbdt_tpu.py, 2026-08-19,
    100 trees d5 F=35): onehot 0.098s vs scatter 0.253s at N=500 and
    0.850s vs 4.342s at N=20000 — XLA's sort-based TPU scatter dominates
    the step, while the one-hot matmuls ride the MXU. On the 1-core host
    CPU the ranking flips (scatter 0.85s vs onehot 6.6s at N=500): the
    extra ~2*N*B*L*3 flops per feature are real arithmetic there. So
    'auto' (the default) picks onehot on TPU and scatter elsewhere."""
    if mode in ("scatter", "onehot"):
        return mode
    if mode not in (None, "", "auto"):
        raise ValueError(f"unknown hist_mode {mode!r} (use 'scatter', 'onehot', or 'auto')")
    import jax

    return "onehot" if jax.default_backend() == "tpu" else "scatter"


def _split_gain(GL, HL, CL, G, H, C, lam, min_child_weight, min_child_samples):
    """Second-order split gain with validity masking; invalid -> -inf."""
    GR = G - GL
    HR = H - HL
    CR = C - CL
    # safe denominators: masked-out entries may hit 0/0, and although
    # jnp.where would still pick -inf, NaN in the untaken branch is banned
    # by this repo's exactness discipline (grads are never taken of this)
    dl = jnp.where(HL + lam > 0, HL + lam, 1.0)
    dr = jnp.where(HR + lam > 0, HR + lam, 1.0)
    dp = jnp.where(H + lam > 0, H + lam, 1.0)
    gain = 0.5 * (GL * GL / dl + GR * GR / dr - G * G / dp)
    valid = (
        (HL >= min_child_weight)
        & (HR >= min_child_weight)
        & (CL >= min_child_samples)
        & (CR >= min_child_samples)
    )
    return jnp.where(valid, gain, -jnp.inf)


def _histograms(bins, data, node, n_nodes, hist_mode):
    """Per-(node, feature, bin) sums of data=[g,h,w] -> [L, F, B, 3], plus
    per-node totals [L, 3].

    Two lowerings of the same sum:
      - "scatter": one segment_sum over N*F flattened indices — minimal
        arithmetic (O(N*F) adds), the natural CPU/sparse formulation.
      - "onehot": per-feature (B x N) @ (N x L*3) matmuls over one-hot
        bin/node encodings — ~2*N*B*L*3 flops per feature, i.e. far more
        arithmetic, but it runs on the TPU MXU where XLA's scatter
        lowering (sort-based) can dominate the step. Pick per backend via
        the hist_mode static arg (PD_FUSION_GBDT_HIST for the wrapper);
        both produce the same sums (equivalence-tested).
    """
    n, f = bins.shape
    if hist_mode == "onehot":
        # HIGHEST precision is load-bearing: the default TPU matmul runs
        # bf16 MXU passes, which would truncate the f32 g/h sums to ~3
        # digits and make this lowering disagree with scatter (the same
        # trap documented around every f32 matmul parity test in this
        # repo). HIGHEST keeps true input precision; the MXU still runs
        # it (as f32-accumulated passes).
        hi = jax.lax.Precision.HIGHEST
        node1h = jax.nn.one_hot(node, n_nodes, dtype=data.dtype)  # [N, L]
        nw = (node1h[:, :, None] * data[:, None, :]).reshape(n, n_nodes * 3)

        def one_feat(bf):
            b1h = jax.nn.one_hot(bf, N_BINS, dtype=data.dtype)  # [N, B]
            return jnp.matmul(b1h.T, nw, precision=hi).reshape(N_BINS, n_nodes, 3)

        hist = jax.lax.map(one_feat, bins.T)  # [F, B, L, 3]
        hist = jnp.transpose(hist, (2, 0, 1, 3))  # [L, F, B, 3]
        tot = jnp.matmul(node1h.T, data, precision=hi)  # [L, 3]
        return hist, tot
    if hist_mode != "scatter":
        raise ValueError(f"unknown hist_mode {hist_mode!r} (use 'scatter' or 'onehot')")
    f_range = jnp.arange(f, dtype=jnp.int32)
    flat_ids = (node[:, None] * f + f_range[None, :]) * N_BINS + bins  # [N,F]
    data_b = jnp.broadcast_to(data[:, None, :], (n, f, 3)).reshape(n * f, 3)
    hist = jax.ops.segment_sum(
        data_b, flat_ids.reshape(-1), num_segments=n_nodes * f * N_BINS
    ).reshape(n_nodes, f, N_BINS, 3)
    tot = jax.ops.segment_sum(data, node, num_segments=n_nodes)  # [L,3]
    return hist, tot


def _build_tree(
    bins, g, h, w, depth, lr, lam, min_child_weight, min_child_samples, hist_mode
):
    """Grow one depth-wise tree; returns (tree arrays, per-sample value)."""
    n, f = bins.shape
    l_max = 1 << (depth - 1)
    node = jnp.zeros(n, dtype=jnp.int32)
    data = jnp.stack([g, h, w], axis=-1)  # [N,3]

    feats, thrs, mls, gains_rec = [], [], [], []
    for level in range(depth):
        n_nodes = 1 << level
        hist, tot = _histograms(bins, data, node, n_nodes, hist_mode)
        miss = hist[:, :, MISSING_BIN, :]  # [L,F,3]
        cum = jnp.cumsum(hist[:, :, :N_VALUE_BINS, :], axis=2)  # [L,F,T,3]

        G = tot[:, None, None, 0]
        H = tot[:, None, None, 1]
        C = tot[:, None, None, 2]
        gains = []
        for go_miss_left in (True, False):
            left = cum + miss[:, :, None, :] if go_miss_left else cum
            gains.append(
                _split_gain(
                    left[..., 0], left[..., 1], left[..., 2],
                    G, H, C, lam, min_child_weight, min_child_samples,
                )
            )
        gains = jnp.stack(gains, axis=-1)  # [L,F,T,2]
        flat = gains.reshape(n_nodes, -1)
        best = jnp.argmax(flat, axis=1)
        best_gain = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
        f_best = (best // (N_VALUE_BINS * 2)).astype(jnp.int32)
        rest = best % (N_VALUE_BINS * 2)
        t_best = (rest // 2).astype(jnp.int32)
        ml_best = (rest % 2) == 0  # even index == missing-left arm
        # no beneficial split -> pass-through: everything (incl. missing)
        # routed left via threshold MISSING_BIN + missing-left
        no_split = ~(best_gain > 0.0)
        f_best = jnp.where(no_split, 0, f_best)
        t_best = jnp.where(no_split, MISSING_BIN, t_best)
        ml_best = jnp.where(no_split, True, ml_best)

        pad = l_max - n_nodes
        feats.append(jnp.pad(f_best, (0, pad)))
        thrs.append(jnp.pad(t_best, (0, pad)))
        mls.append(jnp.pad(ml_best, (0, pad)))
        gains_rec.append(jnp.pad(jnp.where(no_split, 0.0, best_gain), (0, pad)))

        f_of_n = f_best[node]
        t_of_n = t_best[node]
        ml_of_n = ml_best[node]
        b = jnp.take_along_axis(bins, f_of_n[:, None], axis=1)[:, 0]
        go_left = jnp.where(b == MISSING_BIN, ml_of_n, b <= t_of_n)
        node = node * 2 + (1 - go_left.astype(jnp.int32))

    # one 3-col segment sum: cols 0,1 are the leaf-value stats (bitwise
    # identical per-element scatter order to the old 2-col sum), col 2 is
    # the leaf cover for TreeSHAP — a SEPARATE segment_sum here changed
    # XLA fusion enough to ulp-shift gains and flip structural near-ties
    # between the fused-sweep and standalone programs
    leaf_stats3 = jax.ops.segment_sum(data, node, num_segments=1 << depth)
    leaf_stats = leaf_stats3[:, :2]
    denom = leaf_stats[:, 1] + lam
    leaf_vals = jnp.where(denom > 0, -lr * leaf_stats[:, 0] / jnp.where(denom > 0, denom, 1.0), 0.0)
    tree = {
        "feat": jnp.stack(feats),  # [D, Lmax] int32
        "thr": jnp.stack(thrs),  # [D, Lmax] int32
        "miss_left": jnp.stack(mls),  # [D, Lmax] bool
        "gain": jnp.stack(gains_rec),  # [D, Lmax] split gains (0 = pass-through)
        "leaf": leaf_vals,  # [2^D] f32
        # leaf sample-weight totals: path-dependent TreeSHAP derives every
        # internal node's "cover" from its descendant leaves
        # (ops/treeshap.py). Recording per-LEVEL covers as extra outputs
        # was tried and REVERTED: keeping the histogram totals alive
        # changed the vmapped (fused-sweep) program's fusion enough to
        # ulp-shift gains and flip structural near-ties vs the standalone
        # program (test_fused_sweep_device_gbdt_reproduces_standalone).
        "leaf_cover": leaf_stats3[:, 2],  # [2^D] f32
    }
    return tree, leaf_vals[node]


@partial(
    jax.jit,
    static_argnames=(
        "n_rounds", "depth", "lr", "lam", "min_child_weight", "min_child_samples",
        "hist_mode",
    ),
)
def train_gbdt(
    bins: jnp.ndarray,  # [N,F] int32 codes from bin_features
    y: jnp.ndarray,  # [N] f32 in {0,1}
    w: jnp.ndarray,  # [N] f32 sample weights (0 = padding)
    base_score: jnp.ndarray,  # scalar f32 initial margin (log-odds)
    *,
    n_rounds: int,
    depth: int,
    lr: float,
    lam: float,
    min_child_weight: float,
    min_child_samples: float,
    hist_mode: str = "scatter",
) -> Dict[str, jnp.ndarray]:
    """Train the full ensemble as one compiled program (scan over rounds)."""

    def round_step(margin, _):
        p = jax.nn.sigmoid(margin)
        g = (p - y) * w
        h = p * (1.0 - p) * w
        tree, delta = _build_tree(
            bins, g, h, w, depth, lr, lam, min_child_weight, min_child_samples,
            hist_mode,
        )
        return margin + delta, tree

    # dtype follows base_score (f32 in production; the numpy-oracle
    # equivalence test runs the same program in f64, where cross-
    # implementation ulp drift cannot flip near-tie argmaxes)
    margin0 = jnp.full(bins.shape[0], base_score, dtype=jnp.asarray(base_score).dtype)
    _, trees = jax.lax.scan(round_step, margin0, None, length=n_rounds)
    return trees  # each leaf: [R, ...]


@partial(jax.jit, static_argnames=("depth",))
def predict_margin(
    trees: Dict[str, jnp.ndarray], bins: jnp.ndarray, base_score: jnp.ndarray, *, depth: int
) -> jnp.ndarray:
    """Sum of tree outputs + base margin for binned samples."""
    n = bins.shape[0]

    def tree_step(margin, tree):
        node = jnp.zeros(n, dtype=jnp.int32)
        for level in range(depth):
            f_of_n = tree["feat"][level][node]
            t_of_n = tree["thr"][level][node]
            ml_of_n = tree["miss_left"][level][node]
            b = jnp.take_along_axis(bins, f_of_n[:, None], axis=1)[:, 0]
            go_left = jnp.where(b == MISSING_BIN, ml_of_n, b <= t_of_n)
            node = node * 2 + (1 - go_left.astype(jnp.int32))
        return margin + tree["leaf"][node], None

    margin0 = jnp.full(n, base_score, dtype=jnp.asarray(base_score).dtype)
    margin, _ = jax.lax.scan(tree_step, margin0, trees)
    return margin


def compute_base_score(y: np.ndarray, w: Optional[np.ndarray] = None) -> float:
    """Weighted-prevalence log-odds (LightGBM boost_from_average). The ONE
    canonical expression: the parallel CV engine and DeviceHistGBDT.fit
    must produce bit-identical base scores, or ulp-level drift can flip
    near-tie split argmaxes between the two paths (exact ties are
    structural in this algorithm — see tests/test_device_gbdt.py)."""
    y = np.asarray(y, np.float32)
    w = np.ones_like(y) if w is None else np.asarray(w, np.float32)
    wsum = float(w.sum())
    p = float((y * w).sum() / wsum) if wsum > 0 else 0.5
    p = min(max(p, 1e-7), 1.0 - 1e-7)
    return float(np.log(p / (1.0 - p)))


# --------------------------------------------------------------------------
# sklearn-style wrapper (drop-in for the UnimodalGBDT backend chain)
# --------------------------------------------------------------------------

class DeviceHistGBDT:
    """sklearn-like binary classifier over train_gbdt/predict_margin.

    Accepts lgbm-style params (n_estimators, learning_rate, max_depth,
    reg_lambda, min_child_samples, min_child_weight); num_leaves has no
    depth-wise equivalent and maps to the nearest depth when max_depth
    is unset. Stores only numpy state so pickling never captures jitted
    callables.
    """

    def __init__(
        self,
        n_estimators: int = 100,
        learning_rate: float = 0.1,
        max_depth: Optional[int] = None,
        num_leaves: Optional[int] = None,
        reg_lambda: float = 0.0,
        min_child_samples: int = 20,
        min_child_weight: float = 1e-3,
        random_state: Optional[int] = None,  # deterministic: accepted, unused
        hist_mode: Optional[str] = None,
        class_weight: Optional[str] = None,  # None or "balanced" (lgbm semantics)
    ):
        if max_depth is None or max_depth <= 0:
            leaves = num_leaves or 31
            max_depth = max(1, int(np.ceil(np.log2(max(2, leaves)))))
        if max_depth > 10:
            import logging

            logging.getLogger("pd_fusion").warning(
                "DeviceHistGBDT: max_depth %d clamped to 10 (2^depth leaf "
                "arrays are static-shape; the host backends honor larger "
                "depths)", max_depth,
            )
        self.n_estimators = int(n_estimators)
        self.learning_rate = float(learning_rate)
        self.max_depth = int(min(max_depth, 10))
        self.reg_lambda = float(reg_lambda)
        self.min_child_samples = float(min_child_samples)
        self.min_child_weight = float(min_child_weight)
        # 'auto' resolves per-backend at fit time (onehot on TPU, scatter
        # elsewhere — see resolve_hist_mode); resolution is deferred so
        # constructing a model never forces jax backend initialization
        self.hist_mode = hist_mode or os.environ.get("PD_FUSION_GBDT_HIST", "auto")
        if self.hist_mode not in ("scatter", "onehot", "auto"):
            raise ValueError(
                f"unknown hist_mode {self.hist_mode!r} (use 'scatter', 'onehot', or 'auto')"
            )
        if class_weight not in (None, "balanced"):
            raise ValueError(f"unsupported class_weight {class_weight!r}")
        self.class_weight = class_weight
        self.edges_: Optional[List[np.ndarray]] = None
        self.trees_: Optional[Dict[str, np.ndarray]] = None
        self.base_score_: float = 0.0
        self._trees_dev = None  # device-resident cache; never pickled

    def fit(self, X, y, sample_weight=None):
        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float32).reshape(-1)
        w = (
            np.ones_like(y)
            if sample_weight is None
            else np.asarray(sample_weight, np.float32).reshape(-1)
        )
        if getattr(self, "class_weight", None) == "balanced" and sample_weight is None:
            # sklearn/lgbm formula: n_samples / (n_classes * bincount(y))
            counts = np.bincount(y.astype(np.int64), minlength=2).astype(np.float64)
            cw = len(y) / (2.0 * np.maximum(counts, 1.0))
            w = cw[y.astype(np.int64)].astype(np.float32)
        self.edges_ = fit_bin_edges(X)
        bins = bin_features(X, self.edges_)
        self.base_score_ = compute_base_score(y, w)
        trees = train_gbdt(
            jnp.asarray(bins),
            jnp.asarray(y),
            jnp.asarray(w),
            jnp.float32(self.base_score_),
            n_rounds=self.n_estimators,
            depth=self.max_depth,
            lr=self.learning_rate,
            lam=self.reg_lambda,
            min_child_weight=self.min_child_weight,
            min_child_samples=self.min_child_samples,
            hist_mode=resolve_hist_mode(getattr(self, "hist_mode", None)),
        )
        self.trees_ = {k: np.asarray(v) for k, v in trees.items()}
        self._trees_dev = trees  # keep the device copies for predicts
        return self

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_trees_dev"] = None  # device buffers are not picklable state
        return state

    def _margin(self, X) -> np.ndarray:
        if self.trees_ is None:
            raise RuntimeError("DeviceHistGBDT is not fitted")
        if getattr(self, "_trees_dev", None) is None:
            # one upload after unpickle, then cached — scenario evals call
            # predict once per scenario and each device_put costs a relay
            # round-trip
            self._trees_dev = {k: jnp.asarray(v) for k, v in self.trees_.items()}
        bins = bin_features(np.asarray(X, np.float32), self.edges_)
        out = predict_margin(
            self._trees_dev,
            jnp.asarray(bins),
            jnp.float32(self.base_score_),
            depth=self.max_depth,
        )
        return np.asarray(out)

    @property
    def feature_importances_(self) -> np.ndarray:
        """Gain-based importances, normalized to sum 1 (total split gain
        per feature across the ensemble). Restores the suites'
        tree-importance outputs on this backend — sklearn's HistGB has no
        feature_importances_ at all, so the reference's top-20 importance
        CSVs (reference scripts/ppmi_meaningful_suite.py) silently skip
        on the in-image fallback chain.

        Raises AttributeError subclasses when unavailable so
        ``hasattr(clf, "feature_importances_")`` duck-typing probes (the
        suites' dispatch) degrade to the no-importances branch instead of
        crashing."""
        from sklearn.exceptions import NotFittedError  # ValueError+AttributeError

        if self.trees_ is None:
            raise NotFittedError("DeviceHistGBDT is not fitted")
        if "gain" not in self.trees_:
            raise AttributeError(
                "this DeviceHistGBDT artifact predates gain recording; "
                "retrain to get feature_importances_"
            )
        feat = self.trees_["feat"].ravel()
        thr = self.trees_["thr"].ravel()
        gain = self.trees_["gain"].ravel().astype(np.float64)
        real = thr != MISSING_BIN  # pass-through/padded nodes carry no split
        imp = np.bincount(feat[real], weights=gain[real], minlength=len(self.edges_))
        tot = imp.sum()
        return (imp / tot if tot > 0 else imp).astype(np.float64)

    def predict_proba(self, X) -> np.ndarray:
        p1 = 1.0 / (1.0 + np.exp(-self._margin(X)))
        return np.stack([1.0 - p1, p1], axis=1)

    def predict(self, X) -> np.ndarray:
        return (self._margin(X) > 0).astype(np.int64)

    def shap_values(self, X) -> np.ndarray:
        """Exact path-dependent TreeSHAP in margin (log-odds) space —
        what shap.TreeExplainer(clf).shap_values(X)[1] returns for the
        reference's boosted-tree winners (the shap package is absent
        in-image; ops/treeshap.py implements the same quantity as dense
        device tensor algebra). Sets ``expected_value_``; rows satisfy
        sum(phi) + expected_value_ == decision margin."""
        from pd_fusion.ops import treeshap

        if self.trees_ is None:
            raise RuntimeError("DeviceHistGBDT is not fitted")
        if "leaf_cover" not in self.trees_:
            raise AttributeError(
                "this DeviceHistGBDT artifact predates cover recording; "
                "retrain to get shap_values"
            )
        if getattr(self, "_trees_dev", None) is None:
            self._trees_dev = {k: jnp.asarray(v) for k, v in self.trees_.items()}
        bins = bin_features(np.asarray(X, np.float32), self.edges_)
        phi, ev = treeshap.shap_values(
            self._trees_dev, bins, self.base_score_, depth=self.max_depth
        )
        self.expected_value_ = ev
        return phi

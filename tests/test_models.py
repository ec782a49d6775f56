"""Model-family tests: each family learns a separable synthetic problem and
round-trips through save/load."""
import numpy as np
import pytest

from pd_fusion.utils.seed import set_seed


def _separable(n=300, d=6, seed=0):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, n)
    X = rng.randn(n, d) + y[:, None] * 1.5
    return X.astype(np.float32), y


def _auc(y, p):
    from sklearn.metrics import roc_auc_score

    return roc_auc_score(y, p)


def test_fusion_late_learns(tmp_path):
    from pd_fusion.models.fusion_late import LateFusionModel

    set_seed(0)
    X, y = _separable()
    m = LateFusionModel(6, {"hidden_dims": [16, 8], "dropout": 0.1, "lr": 0.01, "epochs": 200})
    m.train(X, y)
    assert _auc(y, m.predict_proba(X)) > 0.9

    m.save(tmp_path / "m.pt")
    m2 = LateFusionModel.load(tmp_path / "m.pt")
    np.testing.assert_allclose(m.predict_proba(X), m2.predict_proba(X), atol=1e-6)


def test_fusion_masked_appends_mask(tmp_path):
    from pd_fusion.models.fusion_masked import MaskedFusionModel

    set_seed(0)
    X, y = _separable()
    mask = np.ones((len(X), 3), np.float32)
    Xm = np.concatenate([X, mask], axis=1)
    m = MaskedFusionModel(6, 3, {"hidden_dims": [16], "dropout": 0.0, "lr": 0.01, "epochs": 150})
    m.train(Xm, y)
    assert hasattr(m, "mask_dim")
    p = m.predict_proba(X, masks=mask)  # mask concat happens inside
    assert _auc(y, p) > 0.85


def test_fusion_moddrop_trains_and_respects_masks():
    from pd_fusion.models.fusion_moddrop import ModalityDropoutModel

    set_seed(0)
    n = 240
    rng = np.random.RandomState(1)
    y = rng.randint(0, 2, n)
    # only the 'clinical' block is informative
    Xc = rng.randn(n, 4) + y[:, None] * 2.0
    Xd = rng.randn(n, 3)
    Xm = rng.randn(n, 5)
    X = np.concatenate([Xc, Xd, Xm], axis=1).astype(np.float32)
    mod_dims = {"clinical": 4, "datspect": 3, "mri": 5}
    m = ModalityDropoutModel(
        mod_dims,
        {"hidden_dims": [16, 8], "dropout": 0.1, "lr": 0.01, "batch_size": 32, "epochs": 60,
         "moddrop_rate": 0.3},
    )
    m.train(X, y)
    full_masks = {k: np.ones(n, dtype=int) for k in mod_dims}
    assert _auc(y, m.predict_proba(X, full_masks)) > 0.85

    # zeroing the informative modality must hurt
    drop_clin = dict(full_masks)
    drop_clin["clinical"] = np.zeros(n, dtype=int)
    auc_dropped = _auc(y, m.predict_proba(X, drop_clin))
    assert auc_dropped < 0.75


def test_moe_router_uses_mask(tmp_path):
    from pd_fusion.models.moe import MoEModel

    set_seed(0)
    n = 300
    rng = np.random.RandomState(2)
    y = rng.randint(0, 2, n)
    X_dict = {
        "clinical": (rng.randn(n, 4) + y[:, None] * 1.5).astype(np.float32),
        "datspect": (rng.randn(n, 3) + y[:, None] * 1.5).astype(np.float32),
    }
    mask = np.ones((n, 2), np.float32)
    m = MoEModel(
        {"clinical": 4, "datspect": 3},
        {"expert_hidden_dims": [16, 8], "router_hidden_dims": [8], "lr": 0.01, "epochs": 200},
    )
    m.train(X_dict, y, mask)
    p = m.predict_proba(X_dict, mask)
    assert _auc(y, p) > 0.85
    m.save(tmp_path / "moe.pt")
    m2 = MoEModel.load(tmp_path / "moe.pt")
    np.testing.assert_allclose(p, m2.predict_proba(X_dict, mask), atol=1e-6)


def test_constant_model():
    from pd_fusion.models.dummy import ConstantProbabilityModel

    m = ConstantProbabilityModel()
    y = np.array([1, 1, 1, 0])
    m.train(np.zeros((4, 1)), y)
    assert np.allclose(m.predict_proba(np.zeros((7, 1))), 0.75)


def test_gbdt_fallback_backend():
    from pd_fusion.models.unimodal_gbdt import UnimodalGBDT

    X, y = _separable(200, 5, seed=3)
    # pinned to the host fallback chain (the test's subject); 'auto'
    # resolves to the device trainer on TPU
    m = UnimodalGBDT("clinical", {"backend": "host", "n_estimators": 50,
                                  "learning_rate": 0.1, "max_depth": 3,
                                  "random_state": 0})
    m.train(X, y)
    assert _auc(y, m.predict_proba(X)) > 0.9


def test_calibration_wrapper_improves_or_keeps_probs():
    from pd_fusion.models.calibrate import CalibratedModel
    from pd_fusion.models.unimodal_gbdt import UnimodalGBDT

    X, y = _separable(400, 5, seed=4)
    m = UnimodalGBDT("clinical", {"n_estimators": 30, "random_state": 0})
    m.train(X[:200], y[:200])
    cal = CalibratedModel(m, method="isotonic")
    cal.fit(X[200:], y[200:])
    p = cal.predict_proba(X[200:])
    assert p.min() >= 0 and p.max() <= 1
    # isotonic on the calibration set is monotone in the base scores
    base = m.predict_proba(X[200:])
    order = np.argsort(base)
    assert (np.diff(p[order]) >= -1e-9).all()


def test_calibrated_model_pickle_roundtrip(tmp_path):
    """run_full_pipeline saves calibrated models as whole-object pickles;
    unpickling probes attributes on an instance with an empty __dict__, so
    __getattr__ must not delegate unconditionally (RecursionError otherwise)."""
    import pickle

    from pd_fusion.models.calibrate import CalibratedModel
    from pd_fusion.models.unimodal_gbdt import UnimodalGBDT

    X, y = _separable(300, 5, seed=7)
    m = UnimodalGBDT("clinical", {"n_estimators": 20, "random_state": 0})
    m.train(X[:150], y[:150])
    cal = CalibratedModel(m, method="isotonic")
    cal.fit(X[150:], y[150:])

    path = tmp_path / "model.pt"
    cal.save(path)
    cal2 = CalibratedModel.load(path)
    np.testing.assert_allclose(
        cal2.predict_proba(X[150:]), cal.predict_proba(X[150:]), atol=1e-9
    )
    # delegation to the wrapped model still works post-load
    assert cal2.mod_name == "clinical"
    # raw pickle round-trip too (what joblib/cloudpickle users hit)
    cal3 = pickle.loads(pickle.dumps(cal))
    np.testing.assert_allclose(
        cal3.predict_proba(X[150:]), cal.predict_proba(X[150:]), atol=1e-9
    )


def test_conformal_wrapper_thresholds_and_abstention():
    from pd_fusion.models.conformal import MaskConformalWrapper
    from pd_fusion.models.dummy import ConstantProbabilityModel

    class FakeModel:
        def predict_proba(self, X, masks=None):
            return np.asarray(X).ravel()

    n = 100
    rng = np.random.RandomState(0)
    probs = rng.rand(n)
    y = (probs > 0.4).astype(int)
    masks = {"clinical": np.ones(n, int), "datspect": rng.randint(0, 2, n), "mri": np.ones(n, int)}
    w = MaskConformalWrapper(FakeModel(), alpha=0.2)
    w.fit(probs.reshape(-1, 1), y, masks)
    assert w.global_threshold > 0
    p, abstain = w.predict(probs.reshape(-1, 1), masks)
    # abstention triggers exactly where min(p, 1-p) exceeds the group threshold
    scores = np.minimum(p, 1 - p)
    mask_mat = np.stack([masks[k] for k in sorted(masks)], axis=1)
    for i in range(n):
        key = "".join(str(int(v)) for v in mask_mat[i])
        thr = w.thresholds.get(key, w.global_threshold)
        assert abstain[i] == (scores[i] > thr)


def test_fusion_moddrop_per_sample_variant():
    """moddrop_per_sample: true uses the stress-suite semantics (an
    independent Bernoulli per sample per modality) and still learns."""
    from pd_fusion.models.fusion_moddrop import ModalityDropoutModel

    set_seed(0)
    rng = np.random.RandomState(5)
    n = 200
    y = rng.randint(0, 2, n)
    Xc = rng.randn(n, 4) + y[:, None] * 2.0
    Xd = rng.randn(n, 3) + y[:, None] * 1.0
    X = np.concatenate([Xc, Xd, rng.randn(n, 5)], axis=1).astype(np.float32)
    m = ModalityDropoutModel(
        {"clinical": 4, "datspect": 3, "mri": 5},
        {"hidden_dims": [16], "dropout": 0.1, "lr": 0.01, "batch_size": 32,
         "epochs": 40, "moddrop_rate": 0.3, "moddrop_per_sample": True},
    )
    m.train(X, y)
    full = {k: np.ones(n, dtype=int) for k in ("clinical", "datspect", "mri")}
    assert _auc(y, m.predict_proba(X, full)) > 0.85


def test_all_padding_batch_keeps_params_finite():
    """Ragged group-kfold folds can pad a training set by more than one
    batch_size, so a per-epoch permutation can form a batch whose every
    sample has weight 0. The old maximum(sum(w), 1e-38) loss guard was a
    flushed-to-zero subnormal under XLA: that batch produced 0/0 = nan
    gradients and poisoned the fold's params forever. The safe
    denominator must give loss 0 with exactly-zero grads instead."""
    import jax
    import jax.numpy as jnp

    from pd_fusion.nn.mlp import bce_with_logits, mlp_apply, mlp_init
    from pd_fusion.nn.trainer import train_minibatch_moddrop

    # unit: all-zero weights -> loss 0, zero (not nan) grads
    params = mlp_init(jax.random.PRNGKey(0), [3, 4, 1])

    def loss(p):
        logits = mlp_apply(p, jnp.ones((5, 3)))
        return bce_with_logits(logits, jnp.ones(5), jnp.zeros(5))

    assert float(loss(params)) == 0.0
    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.asarray(leaf) == 0.0)

    # integration: 8 real samples padded to 64 rows, batch_size 8 ->
    # most batches are all-padding in every epoch permutation
    rng = np.random.RandomState(0)
    n_real, n_pad = 8, 56
    Xr = rng.randn(n_real, 3).astype(np.float32)
    yr = rng.randint(0, 2, n_real).astype(np.float32)
    X = np.concatenate([Xr, np.zeros((n_pad, 3), np.float32)])
    y = np.concatenate([yr, np.zeros(n_pad, np.float32)])
    w = np.concatenate([np.ones(n_real, np.float32), np.zeros(n_pad, np.float32)])
    assign = np.ones((1, 3), np.float32)  # one modality over all features
    out = train_minibatch_moddrop(
        params, jnp.asarray(X), jnp.asarray(y), jnp.asarray(w),
        jnp.asarray(assign), jax.random.PRNGKey(1),
        0.01, 5, 8, dropout=0.0, moddrop_rate=0.0,
    )
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()

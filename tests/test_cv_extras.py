"""CV-pipeline extras: calibrated + nested-calibration sequential path,
group-aware CV with subject-level metrics, session-shift retrains, and
the full MIL-bags-through-CV path."""
import shutil

import numpy as np
import pandas as pd
import pytest
import yaml

from pd_fusion.paths import RUNS_DIR


@pytest.fixture
def cleanup_run():
    names = []
    yield names
    for n in names:
        shutil.rmtree(RUNS_DIR / n, ignore_errors=True)


def test_cv_calibrated_nested_sequential_path(cleanup_run):
    """calibrate + nested_calibration forces the sequential fold loop with
    split_train_calibration and the isotonic wrap."""
    from pd_fusion.experiments.run_experiment import run_cv_pipeline

    run_id = "pytest_cv_nested"
    cleanup_run.append(run_id)
    agg = run_cv_pipeline(
        "configs/quickstart.yaml",
        k=3,
        synthetic=True,
        overrides={
            "output_dir": run_id,
            "calibrate": True,
            "nested_calibration": True,
            "calibration_split": 0.25,
        },
    )
    assert "full_observation" in agg
    assert (RUNS_DIR / run_id / "results_fold_3.yaml").exists()
    # calibrated probabilities stay in [0, 1] and metrics are sane
    assert 0.0 <= agg["full_observation"]["ece"]["mean"] <= 1.0


def _grouped_dataset(monkeypatch):
    """Synthetic dataset with 2 sessions per subject (group/session cols)."""
    rng = np.random.RandomState(0)
    n_subj = 60
    rows = []
    masks = {"clinical": [], "datspect": [], "mri": []}
    y_subj = rng.randint(0, 2, n_subj)
    for s in range(n_subj):
        for ses in (1, 2):
            feat = rng.randn(6) + y_subj[s] * 1.2
            rows.append(
                {
                    "patno": len(rows),
                    "subject_id": f"sub{s:03d}",
                    "session": ses,
                    **{f"clinical_f{j}": feat[j] for j in range(6)},
                    "diagnosis": y_subj[s],
                }
            )
            masks["clinical"].append(1)
            masks["datspect"].append(0)
            masks["mri"].append(0)
    df = pd.DataFrame(rows)
    mask_arrays = {k: np.array(v) for k, v in masks.items()}

    import pd_fusion.experiments.run_experiment as R

    monkeypatch.setattr(
        R, "load_dataset", lambda config, data_config, synthetic: ("grouped", df, mask_arrays)
    )
    return df


def test_group_cv_subject_metrics_and_session_shift(cleanup_run, monkeypatch, tmp_path):
    from pd_fusion.experiments.run_experiment import run_cv_pipeline

    _grouped_dataset(monkeypatch)
    run_id = "pytest_cv_grouped"
    cleanup_run.append(run_id)
    agg = run_cv_pipeline(
        "configs/quickstart.yaml",
        k=3,
        synthetic=True,
        overrides={
            "output_dir": run_id,
            "group_col": "subject_id",
            "session_shift": True,
            "session_col": "session",
            "params": {"hidden_dims": [8], "dropout": 0.0, "lr": 0.01, "epochs": 30},
        },
    )
    run_dir = RUNS_DIR / run_id
    # subject-level metrics present (group aggregation path)
    fold1 = yaml.safe_load(open(run_dir / "results_fold_1.yaml"))
    assert "subject_roc_auc" in fold1["full_observation"]
    # group-awareness: no subject appears in two folds
    fa = pd.read_csv(run_dir / "fold_assignments.csv")
    assert (fa.groupby("subject_id")["fold"].nunique() == 1).all()
    # preds CSV carries the group and session columns
    preds = pd.read_csv(run_dir / "preds_fold_1_full_observation.csv")
    assert "subject_id" in preds.columns and "session" in preds.columns
    # session-shift artifacts
    assert (run_dir / "session_shift_ses1_to_2.yaml").exists()
    assert (run_dir / "session_shift_ses2_to_1.yaml").exists()


def test_mil_attention_through_cv_pipeline(cleanup_run, monkeypatch):
    """BASELINE config #5 path: MIL bags column -> mil_attention model
    through the (sequential) CV pipeline with missing-bag scenarios."""
    from pd_fusion.experiments.run_experiment import run_cv_pipeline

    rng = np.random.RandomState(1)
    n = 48
    y = rng.randint(0, 2, n)
    bags = []
    for i in range(n):
        L = rng.randint(6, 14)
        bag = rng.randn(L, 12).astype(np.float32)
        if y[i]:
            bag[rng.choice(L, 2, replace=False)] += 2.0
        bags.append(bag)
    df = pd.DataFrame({"patno": np.arange(n), "diagnosis": y})
    df["mri_mil"] = bags
    masks = {
        "clinical": np.zeros(n, int),
        "datspect": np.zeros(n, int),
        "mri": np.ones(n, int),
    }
    import pd_fusion.experiments.run_experiment as R

    monkeypatch.setattr(
        R, "load_dataset", lambda config, data_config, synthetic: ("milset", df, masks)
    )

    run_id = "pytest_cv_mil"
    cleanup_run.append(run_id)
    agg = run_cv_pipeline(
        "configs/quickstart.yaml",
        k=2,
        synthetic=True,
        overrides={
            "output_dir": run_id,
            "model_type": "mil_attention",
            "mil_column": "mri_mil",
            "params": {
                "hidden_dim": 16,
                "attn_dim": 8,
                "dropout": 0.1,
                "lr": 0.01,
                "batch_size": 8,
                "epochs": 15,
                "missing_prob": 0.5,
            },
        },
    )
    assert "full_observation" in agg
    # mri-drop scenarios degrade toward the constant missing_prob
    full = agg["full_observation"]["roc_auc"]["mean"]
    dropped = agg["clinical_only"]["roc_auc"]["mean"]  # drops datspect+mri -> bags gone
    assert full > 0.6
    assert dropped == pytest.approx(0.5, abs=0.05)  # all-constant predictions


def test_evaluate_subcommand_roundtrip(cleanup_run):
    """Saved-model reload + re-evaluation reproduces the run's results
    exactly for deterministic scenarios (pd-fusion evaluate)."""
    import yaml as _yaml

    from pd_fusion.experiments.run_experiment import evaluate_run, run_full_pipeline

    run_id = "pytest_eval_roundtrip"
    cleanup_run.append(run_id)
    results = run_full_pipeline(
        "configs/quickstart.yaml", synthetic=True, overrides={"output_dir": run_id}
    )
    run_dir = RUNS_DIR / run_id
    re_results = evaluate_run(None, str(run_dir))
    assert (run_dir / "results_eval.yaml").exists()
    # deterministic scenarios (no RNG) must match bit-for-bit
    for scen in ("full_observation", "no_dat", "no_mri", "clinical_only"):
        for metric in ("roc_auc", "ece", "brier_score"):
            assert re_results[scen][metric] == pytest.approx(
                float(results[scen][metric]), abs=1e-6
            ), (scen, metric)


def test_mil_attention_cv_with_nested_calibration(cleanup_run, monkeypatch):
    """MIL + calibrate + nested_calibration: the sequential fold loop with
    the isotonic wrap over bag predictions (the openneuro_ds001907 MIL
    configs' exact combination)."""
    from pd_fusion.experiments.run_experiment import run_cv_pipeline

    rng = np.random.RandomState(2)
    n = 60
    y = rng.randint(0, 2, n)
    bags = []
    for i in range(n):
        L = rng.randint(6, 12)
        bag = rng.randn(L, 10).astype(np.float32)
        if y[i]:
            bag[rng.choice(L, 2, replace=False)] += 2.0
        bags.append(bag)
    df = pd.DataFrame({"patno": np.arange(n), "diagnosis": y})
    df["mri_mil"] = bags
    masks = {
        "clinical": np.zeros(n, int),
        "datspect": np.zeros(n, int),
        "mri": np.ones(n, int),
    }
    import pd_fusion.experiments.run_experiment as R

    monkeypatch.setattr(
        R, "load_dataset", lambda config, data_config, synthetic: ("milset", df, masks)
    )

    run_id = "pytest_cv_mil_cal"
    cleanup_run.append(run_id)
    agg = run_cv_pipeline(
        "configs/quickstart.yaml",
        k=2,
        synthetic=True,
        overrides={
            "output_dir": run_id,
            "model_type": "mil_attention",
            "mil_column": "mri_mil",
            "calibrate": True,
            "nested_calibration": True,
            "calibration_split": 0.25,
            "params": {"hidden_dim": 16, "attn_dim": 8, "dropout": 0.1, "lr": 0.01,
                       "batch_size": 8, "epochs": 10, "missing_prob": 0.5},
        },
    )
    assert "full_observation" in agg
    assert 0.0 <= agg["full_observation"]["ece"]["mean"] <= 1.0


def test_batched_fold_init_matches_eager_init():
    """_init_folds_mlp (one jitted program for all folds' params) must
    reproduce per-fold eager mlp_init with the same keys. Equality is to
    float eps, not bitwise: under jit XLA fuses the uniform's
    lo + u*(hi-lo) into an FMA, so the last mantissa bit can differ from
    the eager op-by-op rounding. Reproducibility of runs is unaffected —
    every CV path (standalone, fused sweep) draws through this same
    program."""
    import jax
    import numpy as np

    from pd_fusion.nn.mlp import mlp_init
    from pd_fusion.parallel.cv_engine import _init_folds_mlp, _stack_params

    keys = [jax.random.PRNGKey(i) for i in range(4)]
    dims = (11, 16, 1)
    eager = _stack_params([mlp_init(k, list(dims)) for k in keys])
    batched = _init_folds_mlp(jax.numpy.stack(keys), dims)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        eager,
        batched,
    )
    # and the batched program is self-consistent across calls (cache hit)
    again = _init_folds_mlp(jax.numpy.stack(keys), dims)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        batched,
        again,
    )


@pytest.mark.parametrize("nested", [False, True])
def test_parallel_calibrated_cv_matches_sequential(cleanup_run, nested):
    """VERDICT r2 #3: calibrate (and nested_calibration) run through the
    one-program parallel CV engine; with the same seed the parallel and
    sequential (parallel_cv: false) paths consume identical PRNG keys per
    fold, so per-fold metrics must agree to numerical tolerance.

    k=5 divides quickstart's N=500 evenly: with equal-sized folds the
    vmapped whole-CV program sees per-fold arrays of exactly the
    sequential loop's shapes (no padding confounder). Tolerance is
    backend-aware: on CPU the two paths agree to 2e-3 (semantics proof —
    identical keys, splits, batch order). On TPU the vmapped and
    sequential programs fuse/tile reductions differently even at HIGHEST
    matmul precision; 20 chained Adam epochs amplify that rounding
    chaotically and isotonic calibration quantizes probs into ties, so
    AUC steps by ~3-4e-3 between the paths (measured; same phenomenon as
    the torch-Adam trajectory split in test_torch_equivalence). The 1e-2
    TPU band still catches real semantic bugs — a wrong key order or
    split shifts AUC by >=5e-2."""
    import yaml as _yaml

    from pd_fusion.experiments.run_experiment import run_cv_pipeline

    base = {
        "calibrate": True,
        "nested_calibration": nested,
        "calibration_split": 0.25,
        "params": {"hidden_dims": [16], "dropout": 0.0, "lr": 0.005,
                   "batch_size": 32, "epochs": 20, "moddrop_rate": 0.2},
    }
    runs = {}
    import jax as _jax

    for mode, flag in (("par", True), ("seq", False)):
        run_id = f"pytest_cal_parity_{mode}_{int(nested)}"
        cleanup_run.append(run_id)
        # HIGHEST matmul precision: on TPU the DEFAULT f32 matmul is bf16
        # MXU passes, and the vmapped whole-CV program rounds differently
        # from the sequential per-fold loop — 20 chained epochs amplify
        # that into ~4e-3 AUC drift (passes exactly on CPU). The parity
        # claim is about key/batch semantics, so pin true-f32 matmuls.
        with _jax.default_matmul_precision("highest"):
            agg = run_cv_pipeline(
                "configs/quickstart.yaml",
                k=5,
                synthetic=True,
                overrides={**base, "output_dir": run_id, "parallel_cv": flag},
            )
        folds = [
            _yaml.safe_load(open(RUNS_DIR / run_id / f"results_fold_{i}.yaml"))
            for i in (1, 2, 3, 4, 5)
        ]
        runs[mode] = (agg, folds)

    tol = 2e-3 if _jax.default_backend() == "cpu" else 1e-2
    for i in range(5):
        pf, sf = runs["par"][1][i], runs["seq"][1][i]
        for scen in ("full_observation", "no_mri", "clinical_only"):
            for metric in ("roc_auc", "ece", "brier_score"):
                assert pf[scen][metric] == pytest.approx(sf[scen][metric], abs=tol), (
                    i, scen, metric, pf[scen][metric], sf[scen][metric],
                )


@pytest.mark.parametrize("nested", [False, True])
def test_parallel_calibrated_moe_cv_matches_sequential(cleanup_run, nested):
    """VERDICT r3 #5: calibrated MoE — the last family x option combo —
    routes through the one-program parallel CV engine (packed raw
    scenario + calibration probs -> host isotonic -> packed metrics).
    Same-seed parallel vs sequential per-fold metrics must agree; see
    test_parallel_calibrated_cv_matches_sequential for the tolerance
    rationale (isotonic tie-quantization under lowering-level ulp drift)."""
    import yaml as _yaml

    from pd_fusion.experiments.run_experiment import run_cv_pipeline

    base = {
        "model_type": "moe",
        "calibrate": True,
        "nested_calibration": nested,
        "calibration_split": 0.25,
        "params": {"expert_hidden_dims": [16], "router_hidden_dims": [8],
                   "lr": 0.005, "epochs": 15},
    }
    runs = {}
    import jax as _jax

    for mode, flag in (("par", True), ("seq", False)):
        run_id = f"pytest_moe_cal_parity_{mode}_{int(nested)}"
        cleanup_run.append(run_id)
        with _jax.default_matmul_precision("highest"):
            agg = run_cv_pipeline(
                "configs/quickstart.yaml",
                k=5,
                synthetic=True,
                overrides={**base, "output_dir": run_id, "parallel_cv": flag},
            )
        folds = [
            _yaml.safe_load(open(RUNS_DIR / run_id / f"results_fold_{i}.yaml"))
            for i in (1, 2, 3, 4, 5)
        ]
        runs[mode] = (agg, folds)

    tol = 2e-3 if _jax.default_backend() == "cpu" else 1e-2
    for i in range(5):
        pf, sf = runs["par"][1][i], runs["seq"][1][i]
        for scen in ("full_observation", "no_mri", "clinical_only"):
            for metric in ("roc_auc", "ece", "brier_score"):
                assert pf[scen][metric] == pytest.approx(sf[scen][metric], abs=tol), (
                    i, scen, metric, pf[scen][metric], sf[scen][metric],
                )


def test_parallel_mil_cv_matches_sequential(cleanup_run, monkeypatch):
    """VERDICT r2 #3: precomputed-bag MIL runs through the one-program
    parallel engine. With equal-sized folds (N % K == 0) the vmapped
    trainer consumes identical keys and batch structure to the
    sequential per-fold loop, so metrics must agree numerically."""
    import yaml as _yaml

    from pd_fusion.experiments.run_experiment import run_cv_pipeline

    rng = np.random.RandomState(5)
    n = 64  # 2 folds x 32 -> equal fold sizes
    y = rng.randint(0, 2, n)
    bags = []
    for i in range(n):
        L = rng.randint(6, 12)
        bag = rng.randn(L, 10).astype(np.float32)
        if y[i]:
            bag[rng.choice(L, 2, replace=False)] += 2.0
        bags.append(bag)
    df = pd.DataFrame({"patno": np.arange(n), "diagnosis": y})
    df["mri_mil"] = bags
    masks = {
        "clinical": np.zeros(n, int),
        "datspect": np.zeros(n, int),
        "mri": np.ones(n, int),
    }
    import pd_fusion.experiments.run_experiment as R

    monkeypatch.setattr(
        R, "load_dataset", lambda config, data_config, synthetic: ("milpar", df, masks)
    )

    base = {
        "model_type": "mil_attention",
        "mil_column": "mri_mil",
        "calibrate": True,
        "nested_calibration": False,
        "params": {"hidden_dim": 16, "attn_dim": 8, "dropout": 0.1, "lr": 0.01,
                   "batch_size": 8, "epochs": 8, "missing_prob": 0.5,
                   "early_stopping_patience": 3},
    }
    runs = {}
    for mode, flag in (("par", True), ("seq", False)):
        run_id = f"pytest_mil_parity_{mode}"
        cleanup_run.append(run_id)
        run_cv_pipeline(
            "configs/quickstart.yaml", k=2, synthetic=True,
            overrides={**base, "output_dir": run_id, "parallel_cv": flag},
        )
        runs[mode] = [
            _yaml.safe_load(open(RUNS_DIR / run_id / f"results_fold_{i}.yaml"))
            for i in (1, 2)
        ]

    for i in range(2):
        for scen in ("full_observation", "clinical_only"):
            for metric in ("roc_auc", "ece", "brier_score"):
                assert runs["par"][i][scen][metric] == pytest.approx(
                    runs["seq"][i][scen][metric], abs=2e-3
                ), (i, scen, metric)

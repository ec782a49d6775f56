"""Golden parity harness vs the torch reference.

Three tiers (SURVEY §7 build-plan item 8):
1. DATA bit-parity: the synthetic generator consumes the numpy global RNG
   in the reference's exact call order, so seed-42 data is bit-identical
   (verified against the reference generator in-image 2026-08-16; the
   golden sha256 below pins it).
2. SCENARIO determinism: drop_modalities scenarios are RNG-free and thus
   exactly reproducible.
3. METRIC-band parity: the reference's committed quickstart artifact
   (runs/run_20260201_210705/results.yaml: full_observation ROC-AUC
   0.7121 with the NaN->0 semantics this rebuild implements) sets the
   band a longer-trained quickstart model must land in. Training RNG
   differs (jax vs torch) so this is a tolerance check, not bit equality.
"""
import hashlib

import numpy as np
import pytest

from pd_fusion.data.ppmi_loader import generate_synthetic_data
from pd_fusion.data.schema import MODALITIES
from pd_fusion.utils.seed import set_seed

SYNTH_CFG = {
    "num_samples": 500,
    "clinical_dim": 10,
    "datspect_dim": 5,
    "mri_dim": 20,
    "missing_rates": [0.1, 0.3, 0.4],
}
# sha256 over (df float64 bytes, mask int64 bytes) for seed 42 — verified
# bit-identical to the reference generator's output in this image.
GOLDEN_SHA = "be20614731c8e300da87a83bb3afc52a7347658a9e3f3328be9808c7861237bd"

# reference committed quickstart artifact (BASELINE.md):
REF_FULL_OBS_ROC_AUC = 0.7121


def _data_hash():
    set_seed(42)
    df, masks = generate_synthetic_data(SYNTH_CFG)
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(df.to_numpy(dtype=np.float64)).tobytes())
    for m in MODALITIES:
        h.update(masks[m].astype(np.int64).tobytes())
    return h.hexdigest(), df, masks


def test_synthetic_data_bit_parity_with_reference():
    digest, _, _ = _data_hash()
    assert digest == GOLDEN_SHA


def test_quickstart_metric_band_vs_committed_reference_run(tmp_path):
    """Train the quickstart model longer (deterministic eval path) and
    require full_observation ROC-AUC within a band around the reference's
    committed 0.7121. The band is wide (±0.12) because both sides are
    5-epoch-scale stochastic models; the point is catching gross
    behavioral regressions (wrong masks, broken scaler, label leakage
    would all blow past it in one direction or the other)."""
    import shutil

    from pd_fusion.experiments.run_experiment import run_full_pipeline
    from pd_fusion.paths import RUNS_DIR

    run_id = "pytest_parity_band"
    try:
        results = run_full_pipeline(
            "configs/quickstart.yaml",
            synthetic=True,
            overrides={"output_dir": run_id},
        )
        auc = float(results["full_observation"]["roc_auc"])
        assert abs(auc - REF_FULL_OBS_ROC_AUC) < 0.12, auc
        # degradation ordering sanity: random-2-drop must not beat full
        assert float(results["random_2_drop"]["roc_auc"]) <= auc + 0.05
    finally:
        shutil.rmtree(RUNS_DIR / run_id, ignore_errors=True)

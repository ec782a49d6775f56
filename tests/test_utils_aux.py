"""Aux subsystem tests: checkpointing, profiling, callbacks, io, seed
determinism."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_checkpoint_roundtrip(tmp_path):
    from pd_fusion.utils.checkpoint import latest_step, load_checkpoint, save_checkpoint

    state = {
        "params": [{"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}],
        "epoch": 7,
    }
    save_checkpoint(tmp_path / "ckpt", state, step=7)
    assert latest_step(tmp_path / "ckpt") == 7
    back = load_checkpoint(tmp_path / "ckpt")
    assert back["epoch"] == 7
    np.testing.assert_allclose(np.asarray(back["params"][0]["w"]), np.arange(6).reshape(2, 3))

    # later step supersedes
    state["epoch"] = 9
    save_checkpoint(tmp_path / "ckpt", state, step=9)
    assert latest_step(tmp_path / "ckpt") == 9
    assert load_checkpoint(tmp_path / "ckpt")["epoch"] == 9


def test_phase_timer_accumulates():
    from pd_fusion.utils.profiling import get_phase_times, phase_timer, reset_phase_times

    reset_phase_times()
    with phase_timer("unit_test_phase", log=False):
        time.sleep(0.01)
    with phase_timer("unit_test_phase", log=False):
        time.sleep(0.01)
    assert get_phase_times()["unit_test_phase"] >= 0.02
    reset_phase_times()


def test_callbacks():
    from pd_fusion.training.callbacks import EarlyStopping, MetricEarlyStopping

    es = EarlyStopping(patience=2)
    assert not es(1.0) and not es(0.9)
    assert not es(0.95)  # 1 bad
    assert es(0.96)  # 2 bad -> stop

    mes = MetricEarlyStopping(patience=2)
    mes.update(0.5, lambda: "state_a")
    mes.update(0.7, lambda: "state_b")
    assert mes.best_state == "state_b"
    assert not mes.early_stop
    mes.update(0.6)
    stopped = mes.update(0.65)
    assert stopped and mes.early_stop
    assert mes.best_metric == 0.7 and mes.best_state == "state_b"

    # MIL degenerate-val semantics: exception epochs map to -1.0 and the
    # best inits at -1.0 (reference mil_attention_finetune.py:169-252), so
    # they never improve, best_state stays None, and the loop breaks after
    # `patience` epochs without a restore
    mes2 = MetricEarlyStopping(patience=2, initial_best=-1.0)
    assert not mes2.update(-1.0, lambda: "epoch1")
    assert mes2.best_state is None
    assert mes2.update(-1.0, lambda: "epoch2")
    assert mes2.early_stop and mes2.best_state is None


def test_save_yaml_casts_numpy(tmp_path):
    import yaml

    from pd_fusion.utils.io import load_yaml, save_yaml

    data = {
        "a": np.float32(0.5),
        "b": np.int64(3),
        "c": [np.float64(1.5), {"d": np.bool_(True)}],
        "e": jnp.asarray(2.5),
    }
    save_yaml(data, tmp_path / "x.yaml")
    # loadable with the SAFE loader (reference output needs UnsafeLoader)
    back = yaml.safe_load(open(tmp_path / "x.yaml"))
    assert back == {"a": 0.5, "b": 3, "c": [1.5, {"d": True}], "e": 2.5}
    assert load_yaml(tmp_path / "x.yaml") == back


def test_run_pipeline_seed_determinism(tmp_path):
    """Same seed twice -> identical results end-to-end (hidden
    nondeterminism in any stage would break this)."""
    import shutil

    from pd_fusion.experiments.run_experiment import run_full_pipeline
    from pd_fusion.paths import RUNS_DIR

    outs = []
    for tag in ("det_a", "det_b"):
        run_id = f"pytest_{tag}"
        try:
            outs.append(
                run_full_pipeline(
                    "configs/quickstart.yaml", synthetic=True,
                    overrides={"output_dir": run_id, "seed": 123},
                )
            )
        finally:
            shutil.rmtree(RUNS_DIR / run_id, ignore_errors=True)
    a, b = outs
    for scen in a:
        for metric in a[scen]:
            assert float(a[scen][metric]) == pytest.approx(float(b[scen][metric]), abs=1e-6), (
                scen, metric,
            )


def test_cli_rejects_unknown_model_with_registry_listing():
    """--model strings outside the registry fail fast with the valid
    list (exercises experiments.registry.MODEL_REGISTRY)."""
    import pytest

    from pd_fusion.cli import _build_model_overrides
    from pd_fusion.experiments.registry import MODEL_REGISTRY

    class _A:
        model = "definitely_not_a_model"
        config = "configs/quickstart.yaml"

    with pytest.raises(SystemExit, match="unknown --model"):
        _build_model_overrides(_A())

    # every registry entry resolves to an importable constructor
    import importlib

    for name, spec in MODEL_REGISTRY.items():
        mod, _, cls = spec.partition(":")
        assert hasattr(importlib.import_module(mod), cls), name


def test_cli_prepare_dev_smoke(monkeypatch, capsys):
    """prepare-dev reports dataset availability without crashing when no
    dev data is present (reference stubs this subcommand out)."""
    import sys

    from pd_fusion import cli

    monkeypatch.setattr(sys, "argv", ["pd-fusion", "prepare-dev"])
    cli.main()
    out = capsys.readouterr().out
    assert "uci_parkinsons" in out and "uci_telemonitoring" in out

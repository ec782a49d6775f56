"""Unit tests for bench.py's outage watchdog helpers.

The watchdog exists because the axon relay can die MID-bench: the child
records each completed leg into a sidecar JSON and the parent emits one
honest line carrying whatever finished (see bench.py `_watchdog`). The
subprocess/timeout paths were exercised live against a real relay
outage; these tests pin the pure-python pieces: partial recording and
the combined-rate synthesis when both headline legs completed.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _fresh_partial(tmp_path, monkeypatch):
    p = tmp_path / "partial.json"
    monkeypatch.setenv("PD_FUSION_BENCH_PARTIAL", str(p))
    monkeypatch.setattr(bench, "_PARTIAL", {}, raising=True)
    return p


def test_record_partial_accumulates(tmp_path, monkeypatch):
    p = _fresh_partial(tmp_path, monkeypatch)
    bench._record_partial(cv_wall_s=0.4, cv_speedup=7.75)
    bench._record_partial(embed_subj_per_sec=8.0, embed_speedup=15.5)
    got = json.loads(p.read_text())
    assert got == {
        "cv_wall_s": 0.4,
        "cv_speedup": 7.75,
        "embed_subj_per_sec": 8.0,
        "embed_speedup": 15.5,
    }


def test_emit_error_line_without_partials(tmp_path, capsys):
    bench._emit_error_line("relay died", str(tmp_path / "missing.json"))
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0
    assert out["vs_baseline"] == 0.0
    assert out["error"] == "relay died"
    assert out["metric"] == "embed_plus_cv5_subjects_per_sec"


def test_emit_error_line_synthesizes_combined_rate(tmp_path, capsys):
    cv_wall = 0.4
    embed_rate = 8.0
    p = tmp_path / "partial.json"
    p.write_text(
        json.dumps({"cv_wall_s": cv_wall, "embed_subj_per_sec": embed_rate})
    )
    bench._emit_error_line("stall after embed leg", str(p))
    out = json.loads(capsys.readouterr().out.strip())
    subj = bench.N_SUBJECTS * bench.K_FOLDS + bench.N_EMBED
    ours = subj / (cv_wall + bench.N_EMBED / embed_rate)
    ref = subj / (bench.REF_CV_WALL_S + bench.N_EMBED / bench.REF_EMBED_RATE)
    assert out["value"] == round(ours, 1)
    assert out["vs_baseline"] == round(ours / ref, 2)
    # partial fields ride along on the emitted line
    assert out["cv_wall_s"] == cv_wall
    assert out["embed_subj_per_sec"] == embed_rate
    assert "error" in out


def test_emit_error_line_survives_corrupt_partial(tmp_path, capsys):
    p = tmp_path / "partial.json"
    p.write_text("{not json")
    bench._emit_error_line("stall", str(p))
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0 and "error" in out


def test_cpu_fallback_scrubs_env_and_parses_last_line(monkeypatch):
    """The CPU-fallback subprocess must drop the axon hijack (PYTHONPATH
    replaced, PALLAS_AXON_POOL_IPS gone, JAX_PLATFORMS=cpu) and the parser
    must take the LAST stdout line (earlier lines may be warnings)."""
    import subprocess

    captured = {}

    def fake_run(cmd, **kw):
        captured["env"] = kw["env"]

        class R:
            stdout = 'warning: noise\n{"cv_wall_s_cpu": 0.31, "roc_auc_full_observation": 0.87}\n'

        return R()

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setattr(subprocess, "run", fake_run)
    got = bench._cpu_fallback_cv(timeout_s=5.0)
    assert got == {"cv_wall_s_cpu": 0.31, "roc_auc_full_observation": 0.87}
    env = captured["env"]
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["PD_FUSION_BENCH_CPU_CV"] == "1"
    assert "/.axon_site" not in env.get("PYTHONPATH", "")


def test_cpu_fallback_returns_none_on_failure(monkeypatch):
    import subprocess

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._cpu_fallback_cv(timeout_s=5.0) is None


def test_main_outage_path_reports_cpu_fallback(monkeypatch, capsys):
    """Total outage: main() must emit value/vs_baseline 0 with an error,
    plus the clearly-labeled same-host CPU CV fallback keys."""
    monkeypatch.setattr(bench, "wait_for_device", lambda: False)
    monkeypatch.setattr(
        bench,
        "_cpu_fallback_cv",
        lambda timeout_s: {"cv_wall_s_cpu": 0.31, "roc_auc_full_observation": 0.87},
    )
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
    assert "error" in out
    assert out["cv_wall_s_cpu"] == 0.31
    assert out["cv_speedup_cpu"] == round(bench.REF_CV_WALL_S / 0.31, 2)
    assert out["roc_auc_full_observation"] == 0.87


def test_main_outage_path_survives_failed_fallback(monkeypatch, capsys):
    monkeypatch.setattr(bench, "wait_for_device", lambda: False)
    monkeypatch.setattr(bench, "_cpu_fallback_cv", lambda timeout_s: None)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0 and "error" in out
    assert "cv_wall_s_cpu" not in out

"""Sweep submitter dry-run tests: scripts generate correct sbatch files
without submitting."""
import importlib.util
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(script, args, cwd):
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *args],
        cwd=cwd, capture_output=True, text=True, timeout=120,
    )


def test_submit_sweep_dry_run(tmp_path):
    out = _run("submit_sweep.py", ["--dry-run", "--synthetic", "--models", "fusion_moddrop,moe"], tmp_path)
    assert out.returncode == 0, out.stderr[-1000:]
    sweep = next((tmp_path / "runs").glob("sweep_*"))
    scripts = sorted((sweep / "scripts").glob("*.sh"))
    assert len(scripts) == 6  # 2 models x 3 seeds
    content = scripts[0].read_text()
    assert "#SBATCH" in content
    assert "python -m pd_fusion.cli run" in content
    assert "--synthetic" in content
    assert "--seed 42" in content


def test_submit_dual_dry_run(tmp_path):
    out = _run(
        "submit_dual_h200.py",
        ["--dry-run", "--dataset", "openneuro_ds001907", "--k-fold", "5",
         "--models", "fusion_moddrop,moe,fusion_late"],
        tmp_path,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    sweep = next((tmp_path / "runs").glob("dual_sweep_*"))
    scripts = sorted((sweep / "scripts").glob("*.sh"))
    assert len(scripts) == 2  # grid split into two sequential jobs
    joined = "".join(s.read_text() for s in scripts)
    # 3 models x 3 seeds = 9 commands split across the two jobs
    assert joined.count("python -m pd_fusion.cli run") == 9
    assert "--k-fold 5" in joined
    assert "--dataset openneuro_ds001907" in joined

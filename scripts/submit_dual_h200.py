#!/usr/bin/env python
"""Dual-accelerator-node sweep submitter (reference: scripts/
submit_dual_h200.py): splits the model x seed grid into TWO
sequential-command SLURM jobs, with module/conda bootstrap resolution and
PD_FUSION_DEV_DATA_DIR export. Name kept for surface parity; on a TPU
cluster point --partition/--gres at TPU resources.
"""
import argparse
import datetime
import os
import subprocess
from pathlib import Path

MODELS = [
    "unimodal_clinical",
    "unimodal_datspect",
    "unimodal_mri",
    "fusion_late",
    "fusion_masked",
    "fusion_moddrop",
    "moe",
]

SLURM_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --output={log_dir}/{job_name}.out
#SBATCH --error={log_dir}/{job_name}.err
#SBATCH --partition={partition}
#SBATCH --gres={gres}
#SBATCH --time={time_limit}
#SBATCH --mem={mem}
#SBATCH --cpus-per-task={cpus}

set -e
{module_loads}
source ~/.bashrc
{conda_setup}
{conda_activate}

export PYTHONPATH=$PYTHONPATH:$(pwd)/src
{export_dev_dir}

echo "Starting job {job_name}"

{commands}

echo "Job finished"
"""


def build_command(base_config, dataset, synthetic, k_fold, model, seed, output_dir):
    parts = ["python -m pd_fusion.cli run", f"--config {base_config}"]
    if synthetic:
        parts.append("--synthetic")
    if dataset:
        parts.append(f"--dataset {dataset}")
    if k_fold:
        parts.append(f"--k-fold {k_fold}")
    parts += [f"--model {model}", f"--seed {seed}", f"--output-dir {output_dir}"]
    return " \\\n    ".join(parts)


def resolve_conda_base(arg: str) -> str:
    if arg:
        return arg
    conda_exe = os.environ.get("CONDA_EXE")
    if conda_exe:
        try:
            return str(Path(conda_exe).resolve().parent.parent)
        except Exception:
            pass
    return os.environ.get("CONDA_PREFIX", "")


def main():
    parser = argparse.ArgumentParser(description="Submit two jobs with sequential model runs")
    parser.add_argument("--partition", type=str, default="mit_normal_gpu")
    parser.add_argument("--time", type=str, default="05:00:00")
    parser.add_argument("--mem", type=str, default="64G")
    parser.add_argument("--cpus", type=int, default=8)
    parser.add_argument("--gres", type=str, default="gpu:1")
    parser.add_argument("--conda-env", type=str, default="base")
    parser.add_argument("--conda-base", type=str, default="")
    parser.add_argument("--module", type=str, default="")
    parser.add_argument("--base-config", type=str, default="configs/dev_benchmark_suite.yaml")
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--models", type=str, default="")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--k-fold", type=int, default=None)
    parser.add_argument("--dev-data-dir", type=str, default="")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    sweep_dir = Path("runs") / f"dual_sweep_{timestamp}"
    logs_dir = sweep_dir / "logs"
    scripts_dir = sweep_dir / "scripts"
    for d in (sweep_dir, logs_dir, scripts_dir):
        d.mkdir(parents=True, exist_ok=True)

    models = [m.strip() for m in args.models.split(",") if m.strip()] or MODELS
    run_list = [(m, s) for m in models for s in (42, 43, 44)]
    midpoint = (len(run_list) + 1) // 2
    chunks = [run_list[:midpoint], run_list[midpoint:]]

    conda_base = resolve_conda_base(args.conda_base)
    module_loads = f"module load {args.module}" if args.module else ""
    conda_setup = (
        f'source "{conda_base}/etc/profile.d/conda.sh"'
        if conda_base
        else "if command -v conda >/dev/null 2>&1; then :; else echo 'conda not found'; fi"
    )
    conda_activate = (
        f"conda activate {args.conda_env} || source activate {args.conda_env}"
        if args.conda_env and args.conda_env.lower() not in ("none", "")
        else ""
    )

    for idx, chunk in enumerate(chunks, start=1):
        job_name = f"dual_node_{idx}"
        commands = []
        for model, seed in chunk:
            commands.append(
                build_command(
                    args.base_config, args.dataset, args.synthetic, args.k_fold,
                    model, seed, f"dual_sweep_{timestamp}/{model}_s{seed}",
                )
            )
            commands.append("")

        script_path = scripts_dir / f"{job_name}.sh"
        script_path.write_text(
            SLURM_TEMPLATE.format(
                job_name=job_name,
                log_dir=logs_dir.absolute(),
                partition=args.partition,
                gres=args.gres,
                time_limit=args.time,
                mem=args.mem,
                cpus=args.cpus,
                module_loads=module_loads,
                conda_setup=conda_setup,
                conda_activate=conda_activate,
                export_dev_dir=(
                    f"export PD_FUSION_DEV_DATA_DIR={args.dev_data_dir}"
                    if args.dev_data_dir
                    else ""
                ),
                commands="\n".join(commands).strip(),
            )
        )
        if args.dry_run:
            print(f"[DRY RUN] Generated {script_path}")
        else:
            print(f"Submitting {job_name}...")
            subprocess.run(["sbatch", str(script_path)], check=False)

    print(f"Results will be in {sweep_dir}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""SLURM sweep generator: 7 models x 3 seeds -> one sbatch per run
(reference: scripts/submit_sweep.py). Adds a ``--local`` mode that runs
the same grid as sequential in-process runs on the current (TPU) host —
the sweep is embarrassingly parallel independent runs (SURVEY §2.6), and
on a single TPU host sequential cached-jit runs are the idiomatic
equivalent of job-level parallelism.
"""
import argparse
import datetime
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

SEEDS = [42, 43, 44]
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
#SBATCH --time=04:00:00
#SBATCH --mem=32G
#SBATCH --cpus-per-task=4

source ~/.bashrc

echo "Starting job {job_name} (model={model}, seed={seed})"
export PYTHONPATH=$PYTHONPATH:$(pwd)/src

{command}

echo "Job finished"
"""


def build_command(args, model, seed, output_dir):
    parts = ["python -m pd_fusion.cli run", f"--config {args.base_config}"]
    if args.synthetic:
        parts.append("--synthetic")
    if args.dataset:
        parts.append(f"--dataset {args.dataset}")
    if args.k_fold:
        parts.append(f"--k-fold {args.k_fold}")
    parts += [f"--model {model}", f"--seed {seed}", f"--output-dir {output_dir}"]
    return " \\\n    ".join(parts)


def main():
    parser = argparse.ArgumentParser(description="Submit model/seed sweep (SLURM or local)")
    parser.add_argument("--dry-run", action="store_true", help="Generate scripts but do not submit")
    parser.add_argument("--local", action="store_true", help="Run the grid sequentially in-process")
    parser.add_argument(
        "--fused", action="store_true",
        help="With --local: train every seed's CV folds in ONE stacked device "
             "program per model (parallel-CV families only)",
    )
    parser.add_argument("--partition", type=str, default="tpu", help="SLURM partition")
    parser.add_argument("--base-config", type=str, default="configs/dev_benchmark_suite.yaml")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--dataset", type=str, default="")
    parser.add_argument("--k-fold", type=int, default=None)
    parser.add_argument("--models", type=str, default="", help="Comma-separated model subset")
    args = parser.parse_args()

    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    sweep_dir = Path("runs") / f"sweep_{timestamp}"
    logs_dir = sweep_dir / "logs"
    scripts_dir = sweep_dir / "scripts"
    for d in (sweep_dir, logs_dir, scripts_dir):
        d.mkdir(parents=True, exist_ok=True)
    print(f"Generating sweep in {sweep_dir}")

    models = [m for m in args.models.split(",") if m] or MODELS

    if args.local:
        from pd_fusion.experiments.run_experiment import run_cv_pipeline, run_full_pipeline
        from pd_fusion.utils.logging import setup_logging
        from pd_fusion.cli import _build_model_overrides

        setup_logging()
        if args.fused and args.k_fold:
            from pd_fusion.parallel.cv_engine import supports_parallel_cv
            from pd_fusion.parallel.seed_sweep import run_multi_seed_cv
            from pd_fusion.utils.io import load_yaml

            for model in models:
                class _A:  # shim for override expansion
                    pass

                a = _A()
                a.model, a.config = model, args.base_config
                config = load_yaml(Path(args.base_config))
                config.update(_build_model_overrides(a))
                if args.dataset:
                    config["dataset"] = args.dataset
                if not supports_parallel_cv(config):
                    print(f"[fused] {model}: not parallel-CV-capable; skipping "
                          "(rerun without --fused for the sequential path)")
                    continue
                data_config = load_yaml(Path(config.get("data_config", "configs/data_ppmi.yaml")))
                eval_config = load_yaml(Path(config.get("eval_config", "configs/eval_missingness.yaml")))
                print(f"[fused] {model}: {len(SEEDS)} seeds x {args.k_fold} folds in one program")
                run_multi_seed_cv(
                    config, data_config, eval_config, seeds=SEEDS, k=args.k_fold,
                    synthetic=args.synthetic, sweep_dir=sweep_dir / model,
                )
            print(f"Fused local sweep complete. Results in {sweep_dir}")
            return

        for model in models:
            for seed in SEEDS:
                job_name = f"{model}_s{seed}"
                print(f"[local] {job_name}")

                class _Args:  # shim for the CLI's override expansion
                    pass

                a = _Args()
                a.model, a.config = model, args.base_config
                overrides = _build_model_overrides(a)
                overrides["seed"] = seed
                overrides["output_dir"] = f"sweep_{timestamp}/{job_name}"
                if args.dataset:
                    overrides["dataset"] = args.dataset
                if args.k_fold:
                    run_cv_pipeline(args.base_config, k=args.k_fold,
                                    synthetic=args.synthetic, overrides=overrides)
                else:
                    run_full_pipeline(args.base_config, args.synthetic, overrides=overrides)
        print(f"Local sweep complete. Results in {sweep_dir}")
        return

    for model in models:
        for seed in SEEDS:
            job_name = f"{model}_s{seed}"
            command = build_command(args, model, seed, f"sweep_{timestamp}/{job_name}")
            script_path = scripts_dir / f"{job_name}.sh"
            script_path.write_text(
                SLURM_TEMPLATE.format(
                    job_name=job_name, log_dir=logs_dir.absolute(),
                    partition=args.partition, model=model, seed=seed, command=command,
                )
            )
            if args.dry_run:
                print(f"[DRY RUN] Generated {script_path}")
            else:
                print(f"Submitting {job_name}...")
                subprocess.run(["sbatch", str(script_path)])

    print("\nPro-tip: Monitor jobs with 'squeue -u $USER'")
    print(f"Results will be in {sweep_dir}")


if __name__ == "__main__":
    main()

"""CLI — the framework's public entry point.

Identical subcommand surface to the reference (src/pd_fusion/cli.py:14-46):
``validate-data``, ``train``, ``evaluate``, ``run``, ``download-dev``,
``prepare-dev``; the ``run`` command supports ``--model``/``--seed``/
``--output-dir``/``--k-fold``/``--dataset`` overrides with the same
model-name expansion semantics (``unimodal_<mod>[_mlp|_gbdt]`` resolves a
backbone and loads defaults from the sibling model config; reference
cli.py:96-133), and config-driven CV via ``cv_folds``/``k_folds`` keys
(:139-153). The invocation string is exported as PD_FUSION_COMMAND for
provenance (:53).
"""
import argparse
import os
import sys
from pathlib import Path

from pd_fusion.utils.io import load_yaml
from pd_fusion.utils.logging import setup_logging


def _resolve_path(path_str: str) -> Path:
    p = Path(path_str)
    if p.exists():
        return p
    from pd_fusion.paths import ROOT_DIR

    return ROOT_DIR / p


def _load_params(path_str: str):
    try:
        return load_yaml(_resolve_path(path_str)).get("params", {})
    except Exception:
        return {}


def _get_unimodal_backbone(config_path: str) -> str:
    try:
        cfg = load_yaml(_resolve_path(config_path))
        return str(cfg.get("unimodal_backbone", "gbdt")).lower()
    except Exception:
        return "gbdt"


def _build_model_overrides(args) -> dict:
    """Expand --model into model_type/modality/params overrides."""
    overrides = {}
    model = args.model
    if model.startswith("unimodal_") and model != "unimodal_gbdt":
        raw_modality = model.replace("unimodal_", "")
        if raw_modality.endswith("_mlp"):
            backbone, raw_modality = "mlp", raw_modality[: -len("_mlp")]
        elif raw_modality.endswith("_gbdt"):
            backbone, raw_modality = "gbdt", raw_modality[: -len("_gbdt")]
        else:
            backbone = _get_unimodal_backbone(args.config)
        overrides["modality"] = raw_modality
        if backbone == "mlp":
            overrides["model_type"] = "unimodal_mlp"
            overrides["params"] = _load_params("configs/model_fusion.yaml")
        else:
            overrides["model_type"] = "unimodal_gbdt"
            overrides["params"] = _load_params("configs/model_unimodal.yaml")
    elif model in ("fusion_late", "fusion_masked", "fusion_moddrop"):
        overrides["model_type"] = model
        overrides["params"] = _load_params("configs/model_fusion.yaml")
    elif model == "moe":
        overrides["model_type"] = model
        overrides["params"] = _load_params("configs/model_moe.yaml")
    else:
        from pd_fusion.experiments.registry import MODEL_REGISTRY

        if model not in MODEL_REGISTRY:
            raise SystemExit(
                f"unknown --model '{model}'; valid: {', '.join(sorted(MODEL_REGISTRY))} "
                "or a unimodal_<modality>[_mlp|_gbdt] spec"
            )
        overrides["model_type"] = model
    return overrides


def main():
    parser = argparse.ArgumentParser(description="PPMI Multimodal Fusion CLI (TPU-native)")
    subparsers = parser.add_subparsers(dest="command")

    validate_parser = subparsers.add_parser("validate-data")
    validate_parser.add_argument("--config", type=str, required=True, help="Data config (sources)")
    validate_parser.add_argument(
        "--columns", type=str, default="configs/ppmi_columns.yaml", help="Column mapping config"
    )

    train_parser = subparsers.add_parser("train")
    train_parser.add_argument("--config", type=str, required=True)
    train_parser.add_argument("--data-config", type=str, default="configs/data_ppmi.yaml")
    train_parser.add_argument("--synthetic", action="store_true")

    eval_parser = subparsers.add_parser("evaluate")
    eval_parser.add_argument("--config", type=str, required=True)
    eval_parser.add_argument("--run-dir", type=str, required=True)

    full_parser = subparsers.add_parser("run")
    full_parser.add_argument("--config", type=str, required=True)
    full_parser.add_argument("--synthetic", action="store_true")
    full_parser.add_argument("--model", type=str, help="Override model type")
    full_parser.add_argument("--seed", type=int, help="Override random seed")
    full_parser.add_argument("--output-dir", type=str, help="Override output directory name")
    full_parser.add_argument("--k-fold", type=int, help="Run K-Fold CV (e.g. 5)")
    full_parser.add_argument(
        "--dataset", type=str, help="Override dataset name (e.g., uci_parkinsons, openneuro_ds001907)"
    )

    download_parser = subparsers.add_parser("download-dev")
    download_parser.add_argument("--dataset", type=str, default="all")
    download_parser.add_argument("--out", type=str, default="data/raw_dev")
    download_parser.add_argument("--openneuro-metadata-only", action="store_true")

    subparsers.add_parser("prepare-dev")

    args = parser.parse_args()
    setup_logging()
    os.environ["PD_FUSION_COMMAND"] = "python -m pd_fusion.cli " + " ".join(sys.argv[1:])

    if args.command == "download-dev":
        from pd_fusion.data.download.download_manager import (
            download_openneuro_datasets,
            download_uci_datasets,
            print_manual_instructions,
        )

        out_dir = Path(args.out)
        out_dir.mkdir(parents=True, exist_ok=True)
        if args.dataset in ("all", "uci"):
            download_uci_datasets(out_dir)
        if args.dataset in ("all", "openneuro"):
            download_openneuro_datasets(out_dir, metadata_only=args.openneuro_metadata_only)
        if args.dataset in ("all", "manual"):
            print_manual_instructions()

    elif args.command == "validate-data":
        from pd_fusion.data.ppmi_loader import process_and_merge_data

        data_conf = load_yaml(Path(args.config))
        col_conf = load_yaml(Path(args.columns))
        process_and_merge_data(data_conf, col_conf)

    elif args.command == "run":
        overrides = {}
        if args.model:
            overrides.update(_build_model_overrides(args))
        if args.seed is not None:
            overrides["seed"] = args.seed
        if args.output_dir:
            overrides["output_dir"] = args.output_dir
        if args.dataset:
            overrides["dataset"] = args.dataset

        config_k = None
        if args.k_fold is None:
            try:
                conf = load_yaml(Path(args.config))
                config_k = conf.get("cv_folds") or conf.get("k_folds")
            except Exception:
                config_k = None

        if args.k_fold is not None or config_k is not None:
            from pd_fusion.experiments.run_experiment import run_cv_pipeline

            k = args.k_fold if args.k_fold is not None else int(config_k)
            run_cv_pipeline(args.config, k=k, synthetic=args.synthetic, overrides=overrides)
        else:
            from pd_fusion.experiments.run_experiment import run_full_pipeline

            run_full_pipeline(args.config, args.synthetic, overrides=overrides)

    elif args.command == "train":
        # single-split train without the evaluation tail: run the full
        # pipeline (the reference leaves 'train' unimplemented)
        from pd_fusion.experiments.run_experiment import run_full_pipeline

        run_full_pipeline(args.config, args.synthetic, overrides={})

    elif args.command == "evaluate":
        # re-evaluate a finished run's saved model on its dataset (the
        # reference leaves this subcommand unimplemented)
        from pd_fusion.experiments.run_experiment import evaluate_run

        evaluate_run(args.config, args.run_dir)

    elif args.command == "prepare-dev":
        # smoke-verify the downloadable dev datasets (reference stub)
        from pd_fusion.data.dev_datasets.uci_parkinsons import load_uci_parkinsons
        from pd_fusion.data.dev_datasets.uci_telemonitoring import load_uci_telemonitoring

        for name, loader in (
            ("uci_parkinsons", load_uci_parkinsons),
            ("uci_telemonitoring", load_uci_telemonitoring),
        ):
            try:
                df, masks = loader()
                print(f"{name}: OK shape={df.shape} clinical={masks['clinical'].sum()}/{len(df)}")
            except Exception as e:
                print(f"{name}: UNAVAILABLE ({e})")

    elif args.command is None:
        parser.print_help()
    else:
        print("Command not implemented yet.")


if __name__ == "__main__":
    main()

"""Fused multi-seed sweeps: the whole (seed x fold) grid as ONE program.

The reference scales sweeps by submitting one SLURM job per (model, seed)
(scripts/submit_sweep.py); SURVEY §2.6 names the TPU-native alternative:
"optionally jax.vmap over the (model, seed) grid on one chip". This module
implements it for the parallel-CV model families: every seed's K folds
become entries on the SAME stacked fold axis, so S seeds x K folds train
in one vmapped XLA program and evaluate in one fused metrics reduction —
a 3-seed x 7-model sweep that the reference runs as 21 cluster jobs fits
in a handful of device programs.

Artifacts mirror the reference sweep layout: one run dir per (model,
seed) containing resolved_config/provenance, per-fold results +
prediction CSVs, and results_aggregated.yaml — so
analysis.aggregate_results consumes the sweep unchanged.
"""
import copy
import datetime
import logging
from pathlib import Path

import numpy as np
import pandas as pd

from pd_fusion.data.splits import get_group_kfold_splits, get_kfold_splits, get_subset_masks
from pd_fusion.parallel.cv_engine import run_parallel_cv, supports_parallel_cv
from pd_fusion.paths import RUNS_DIR
from pd_fusion.utils.io import save_yaml
from pd_fusion.utils.seed import fresh_key, set_seed

logger = logging.getLogger("pd_fusion")


def run_multi_seed_cv(
    config: dict,
    data_config: dict,
    eval_config: dict,
    seeds,
    k: int,
    synthetic: bool,
    sweep_dir: Path = None,
    dataset_loader=None,
):
    """Train+evaluate K-fold CV for every seed in one stacked program.

    ``dataset_loader(config, data_config, synthetic) -> (name, df, masks)``
    defaults to experiments.run_experiment.load_dataset. Returns
    {seed: aggregated results dict} and writes per-seed run dirs.
    """
    from pd_fusion.experiments.run_experiment import load_dataset, _save_run_provenance
    from pd_fusion.training.train import _resolve_params

    if dataset_loader is None:
        dataset_loader = load_dataset
    if not supports_parallel_cv(config):
        raise ValueError(
            "run_multi_seed_cv requires a parallel-CV-capable config "
            "(MLP/MoE family, no calibration)."
        )
    model_type = config["model_type"]
    if sweep_dir is None:
        sweep_dir = RUNS_DIR / f"fused_sweep_{datetime.datetime.now().strftime('%Y%m%d_%H%M%S')}"
    sweep_dir = Path(sweep_dir)
    sweep_dir.mkdir(parents=True, exist_ok=True)

    group_col = config.get("group_col") or config.get("cv_group_col")

    # ---- per-seed host prep: data, folds, masks, PRNG keys ---------------
    combined_folds, combined_masks, combined_keys = [], [], []
    seed_slices, seed_meta = {}, {}
    for seed in seeds:
        cfg_s = copy.deepcopy(config)
        cfg_s["seed"] = seed
        set_seed(seed)
        dataset_name, df, masks = dataset_loader(cfg_s, data_config, synthetic)
        if group_col:
            folds = list(get_group_kfold_splits(df, n_splits=k, seed=seed, group_col=group_col))
        else:
            folds = list(get_kfold_splits(df, n_splits=k, seed=seed))
        start = len(combined_folds)
        for train_df, val_df in folds:
            combined_folds.append((train_df, val_df))
            combined_masks.append(
                (get_subset_masks(masks, train_df.index), get_subset_masks(masks, val_df.index))
            )
        # draw keys from THIS seed's chain in the same order a standalone
        # run would consume them — interleaved (init, train) per fold,
        # matching both run_parallel_cv and the sequential fold loop — so
        # a fused sweep is bit-reproducible by a per-seed run
        combined_keys.extend((fresh_key(), fresh_key()) for _ in folds)
        seed_slices[seed] = (start, start + len(folds))
        seed_meta[seed] = (dataset_name, cfg_s)

    _resolve_params(config, model_type)
    logger.info(
        f"fused sweep: {len(seeds)} seeds x {k} folds = {len(combined_folds)} "
        f"models in one stacked program"
    )
    metrics_all, fold_preds = run_parallel_cv(
        config, None, None, combined_folds, eval_config,
        fold_masks=combined_masks, fold_keys=combined_keys,
    )

    # ---- per-seed artifacts ---------------------------------------------
    out = {}
    for seed in seeds:
        lo, hi = seed_slices[seed]
        dataset_name, cfg_s = seed_meta[seed]
        run_dir = sweep_dir / f"{model_type}_s{seed}"
        run_dir.mkdir(parents=True, exist_ok=True)
        _save_run_provenance(run_dir, cfg_s, eval_config, dataset_name, synthetic, {"seed": seed})

        seed_metrics = []
        for i, fi in enumerate(range(lo, hi)):
            res = dict(metrics_all[fi])
            res["fold"] = i + 1
            seed_metrics.append(res)
            save_yaml(res, run_dir / f"results_fold_{i + 1}.yaml")
            y_true, y_prob = fold_preds[fi]
            pd.DataFrame(
                {"y_true": y_true.astype(int), "y_prob": y_prob, "fold": i + 1}
            ).to_csv(run_dir / f"preds_fold_{i + 1}_full_observation.csv", index=False)

        aggregated = {}
        scenario_names = [kk for kk in seed_metrics[0] if kk != "fold"]
        for scen in scenario_names:
            aggregated[scen] = {}
            for m in seed_metrics[0][scen]:
                values = [fr[scen][m] for fr in seed_metrics]
                aggregated[scen][m] = {
                    "mean": float(np.mean(values)),
                    "std": float(np.std(values)),
                }
        save_yaml(aggregated, run_dir / "results_aggregated.yaml")
        out[seed] = aggregated

    logger.info(f"fused sweep complete: {sweep_dir}")
    return out, sweep_dir

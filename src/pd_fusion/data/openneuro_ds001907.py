"""OpenNeuro ds001907 dataset loader: prebuilt manifest -> (df, masks).

Behavioral spec (reference: src/pd_fusion/data/openneuro_ds001907.py:
23-82): manifest path from ``PD_FUSION_DS001907_MANIFEST`` env override
or config; ``feature_mode`` selects simple stats / cnn3d / resnet2d /
resnet2d_mil / resnet2d_mil_ft features; the fine-tune mode stores raw
volume paths in ``mri_mil`` so the MIL pipeline consumes them directly;
labels canonicalize to ``diagnosis``; the mri mask derives from feature
presence, clinical/datspect masks are all-zero (MRI-only dataset).

Design: feature modes resolve through a dispatch table of
(cache-dir-key, default-dir, config-key, loader) rows instead of an
if/elif chain, so adding a mode is one line.
"""
import os
from pathlib import Path
from typing import Callable, Dict, Tuple

import numpy as np
import pandas as pd

from pd_fusion.data.schema import TARGET_COL

_DEFAULT_MANIFEST = "data/processed/openneuro_ds001907_manifest.csv"
_CACHE_ROOT = "data/processed/openneuro_ds001907"


def _manifest_path(config: Dict) -> Path:
    override = os.environ.get("PD_FUSION_DS001907_MANIFEST")
    if override:
        return Path(override)
    return Path(config.get("manifest_path", _DEFAULT_MANIFEST))


def _mil_ft_frame(manifest: Path, cache_dir: Path, cfg: Dict) -> pd.DataFrame:
    """Fine-tune mode: no precomputed features — ship the NIfTI paths in
    mri_mil for MilAttentionFineTuneModel to stream."""
    df = pd.read_csv(manifest)
    if "t1wbrain_path" not in df.columns:
        raise ValueError("manifest lacks t1wbrain_path (required for MIL fine-tune)")
    df["mri_mil"] = df["t1wbrain_path"]
    return df


def _mode_table() -> Dict[str, Tuple[str, str, str, Callable]]:
    """feature_mode -> (cache_dir config key, default cache dir,
    feature-config key, builder/loader)."""
    from pd_fusion.data import openneuro_features as F

    return {
        "simple": (
            "feature_cache_dir", f"{_CACHE_ROOT}/features_simple",
            "feature_config", F.load_simple_features,
        ),
        "cnn3d": (
            "embedding_cache_dir", f"{_CACHE_ROOT}/embeddings_cnn3d",
            "cnn_config", F.load_cnn_embeddings,
        ),
        "resnet2d": (
            "resnet2d_cache_dir", f"{_CACHE_ROOT}/embeddings_resnet2d",
            "resnet2d_config", F.load_resnet2d_embeddings,
        ),
        "resnet2d_mil": (
            "resnet2d_cache_dir", f"{_CACHE_ROOT}/embeddings_resnet2d",
            "resnet2d_config", F.load_resnet2d_mil_embeddings,
        ),
        "resnet2d_mil_ft": ("feature_cache_dir", _CACHE_ROOT, "feature_config", _mil_ft_frame),
    }


def load_openneuro_ds001907(config: Dict) -> Tuple[pd.DataFrame, Dict[str, np.ndarray]]:
    manifest = _manifest_path(config)
    if not manifest.exists():
        raise FileNotFoundError(f"ds001907 manifest not found: {manifest}")

    mode = config.get("feature_mode", "simple")
    table = _mode_table()
    if mode not in table:
        raise ValueError(f"unknown feature_mode '{mode}' (choose from {sorted(table)})")
    dir_key, default_dir, cfg_key, loader = table[mode]
    df = loader(manifest, Path(config.get(dir_key, default_dir)), config.get(cfg_key, {}))

    if TARGET_COL not in df.columns:
        if "label" not in df.columns:
            raise ValueError("ds001907 frame lacks both 'label' and 'diagnosis'")
        df[TARGET_COL] = df["label"].astype(int)

    value_cols = [c for c in df.columns if c.startswith("mri_") and c != "mri_mil"]
    if value_cols:
        mri_mask = df[value_cols].notna().any(axis=1).astype(int).to_numpy()
    elif "mri_mil" in df.columns:
        mri_mask = df["mri_mil"].map(lambda bag: int(bag is not None)).to_numpy()
    else:
        raise ValueError("no mri_* feature columns (or mri_mil bags) in ds001907 frame")

    zeros = np.zeros(len(df), dtype=int)
    return df, {"clinical": zeros, "datspect": zeros.copy(), "mri": mri_mask}

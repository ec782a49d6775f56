"""MRI feature / embedding builders for OpenNeuro manifests.

Behavioral spec (reference: src/pd_fusion/data/openneuro_features.py):
content-addressed caching keyed ``sha256(manifest)[:12] +
sha256(config)[:12]`` (:9-20, :75-81), simple 3-D stats features
(:34-73), mean-pooled ResNet2D slice embeddings (:180-278), per-slice
MIL bags (loader :292-310), and the CNN3D embedding loader that defers
to the offline builder script (:106-119).

TPU design: this module is ONLY the cache/orchestration layer. All
numeric work runs through the device-side building blocks —
``ops.volume_stats.simple_volume_features`` (one fused XLA reduction per
volume, vmapped over prefetched batches) and
``imaging.pipeline.run_resnet_embedding_pipeline`` (threaded NIfTI
prefetch + one fused resize/normalize/slice/ResNet program, batched
SUBJECTS_PER_CALL at a time). Pretrained backbones use the ImageNet
preprocessing constants; random-init falls back to 0.5/0.5 — mirroring
the reference's ``weights.meta`` lookup (:215-222).
"""
import hashlib
import json
from functools import partial
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

_KEY_BYTES = 1 << 20


def manifest_key(manifest_path: Path) -> str:
    """First 12 hex chars of the manifest file's sha256 (reference
    _hash_file, openneuro_features.py:9-17)."""
    digest = hashlib.sha256()
    with open(manifest_path, "rb") as fh:
        for block in iter(lambda: fh.read(_KEY_BYTES), b""):
            digest.update(block)
    return digest.hexdigest()[:12]


def config_key(cfg: Dict) -> str:
    """sha256 of the sorted item repr (reference _hash_config,
    openneuro_features.py:19-20 — kept bit-identical so caches built by
    either implementation resolve to the same artifact names)."""
    return hashlib.sha256(str(sorted(cfg.items())).encode()).hexdigest()[:12]


def _cache_stem(prefix: str, manifest_path: Path, cfg: Dict) -> str:
    return f"{prefix}_{manifest_key(manifest_path)}_{config_key(cfg)}"


def _read_manifest(manifest_path: Path) -> pd.DataFrame:
    df = pd.read_csv(manifest_path)
    if "t1wbrain_path" not in df.columns:
        raise ValueError(f"manifest {manifest_path} lacks a t1wbrain_path column")
    return df


def _id_columns(df: pd.DataFrame) -> Dict[str, np.ndarray]:
    return {
        "subject_id": df["subject_id"].to_numpy(),
        "session": df.get("session", pd.Series([1] * len(df))).to_numpy(),
        "label": df["label"].astype(int).to_numpy(),
    }


# ---------------------------------------------------------------------------
# simple 3-D statistics features
# ---------------------------------------------------------------------------

_STATS_BATCH = 8  # volumes per device program (amortizes relay dispatch)


def build_simple_features(manifest_path: Path, cache_dir: Path, config: Dict) -> pd.DataFrame:
    """Masked stats + histogram + grid-mean features for every manifest
    volume; parquet-cached. Feature semantics pinned against a numpy
    oracle in tests/test_imaging_integration.py."""
    import jax
    import jax.numpy as jnp

    from pd_fusion.imaging.pipeline import VolumePrefetcher, make_volume_loader
    from pd_fusion.ops.volume_stats import simple_volume_features

    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    out_path = cache_dir / f"{_cache_stem('features', manifest_path, config)}.parquet"
    if out_path.exists():
        return pd.read_parquet(out_path)

    df = _read_manifest(manifest_path)
    hist_bins = int(config.get("hist_bins", 10))
    grid_size = int(config.get("grid_size", 8))
    extra = bool(config.get("extra_stats", False))
    target = tuple(int(t) for t in config.get("target_shape", (96, 96, 96)))

    @partial(jax.jit, static_argnames=("hist_bins", "grid_size", "extra"))
    def feats_batch(vols, hist_bins, grid_size, extra):
        return jax.vmap(
            lambda v: simple_volume_features(v, hist_bins, grid_size, extra)
        )(vols)

    n = len(df)
    feats: List[np.ndarray] = [None] * n
    pending: List[Tuple[int, np.ndarray]] = []

    def flush():
        idx = [i for i, _ in pending]
        stack = np.stack([v for _, v in pending])
        pad = _STATS_BATCH - len(idx)
        if pad and n >= _STATS_BATCH:  # keep one static shape for the common case
            stack = np.concatenate([stack, np.repeat(stack[:1], pad, axis=0)])
        out = np.asarray(feats_batch(jnp.asarray(stack), hist_bins, grid_size, extra))
        for j, i in enumerate(idx):
            feats[i] = out[j]
        pending.clear()

    loader = make_volume_loader(target)
    for i, vol in VolumePrefetcher([Path(p) for p in df["t1wbrain_path"]], loader):
        pending.append((i, vol))
        if len(pending) == _STATS_BATCH:
            flush()
    if pending:
        flush()

    mat = np.stack(feats).astype(float)
    out = pd.DataFrame(
        {**_id_columns(df), **{f"mri_feat_{k}": mat[:, k] for k in range(mat.shape[1])}}
    )
    out.to_parquet(out_path, index=False)
    return out


# the reference's loader builds on demand (openneuro_features.py:75-104)
load_simple_features = build_simple_features


# ---------------------------------------------------------------------------
# CNN3D embeddings (built offline by scripts/build_cnn3d_embeddings.py)
# ---------------------------------------------------------------------------


def load_cnn_embeddings(manifest_path: Path, cache_dir: Path, config: Dict) -> pd.DataFrame:
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    out_path = cache_dir / f"{_cache_stem('embeddings', manifest_path, config)}.parquet"
    if not out_path.exists():
        raise FileNotFoundError(
            f"CNN3D embeddings missing at {out_path}; build them with "
            "scripts/build_cnn3d_embeddings.py"
        )
    return pd.read_parquet(out_path)


# ---------------------------------------------------------------------------
# ResNet2D embeddings (mean-pooled and per-slice MIL bags)
# ---------------------------------------------------------------------------


def _resnet_setup(config: Dict):
    """Resolve backbone params + preprocessing constants + slicing plan
    from an embedding config."""
    from pd_fusion.nn.resnet import IMAGENET_MEAN, IMAGENET_STD, load_backbone

    arch = config.get("backbone", "resnet18")
    params, dim, pretrained = load_backbone(
        arch,
        weights_path=config.get("weights_path"),
        seed=int(config.get("seed", 0)),
    )
    if pretrained:
        mean, std = IMAGENET_MEAN, IMAGENET_STD
    else:
        mean, std = np.full(3, 0.5, np.float32), np.full(3, 0.5, np.float32)

    if "slice_axes" in config:
        axes = [int(a) for a in config["slice_axes"]]
        counts = [int(c) for c in config["slice_counts"]]
    else:
        axes = [int(config.get("slice_axis", 2))]
        counts = [int(config.get("slice_count", 24))]
    return arch, params, dim, pretrained, mean, std, axes, counts


def _run_embed(manifest_df: pd.DataFrame, config: Dict, per_slice: bool):
    from pd_fusion.imaging.pipeline import run_resnet_embedding_pipeline

    arch, params, dim, pretrained, mean, std, axes, counts = _resnet_setup(config)
    embeddings = run_resnet_embedding_pipeline(
        [Path(p) for p in manifest_df["t1wbrain_path"]],
        manifest_df["subject_id"].tolist(),
        params,
        mean,
        std,
        arch=arch,
        target_shape=tuple(int(t) for t in config.get("target_shape", (160, 160, 160))),
        axes=axes,
        counts=counts,
        input_size=int(config.get("input_size", 224)),
        tta=int(config.get("tta", 1)),
        max_rotation=float(config.get("max_rotation_deg", 5.0)),
        max_translation=float(config.get("max_translation", 0.05)),
        intensity_scale=float(config.get("intensity_scale", 0.1)),
        intensity_shift=float(config.get("intensity_shift", 0.1)),
        noise_std=float(config.get("noise_std", 0.01)),
        per_slice=per_slice,
        compute_dtype=str(config.get("compute_dtype", "float32")),
    )
    return embeddings, arch, dim, pretrained


def _write_meta(path: Path, manifest_path: Path, config: Dict, arch: str, dim: int,
                pretrained: bool, n: int) -> None:
    meta = {
        "manifest": str(manifest_path),
        "config": {k: (list(v) if isinstance(v, tuple) else v) for k, v in config.items()},
        "backbone": arch,
        "emb_dim": int(dim),
        "pretrained": bool(pretrained),
        "n_subjects": int(n),
    }
    path.write_text(json.dumps(meta, indent=2))


def build_resnet2d_embeddings(manifest_path: Path, cache_dir: Path, config: Dict) -> pd.DataFrame:
    """Mean-pooled [emb_dim] embedding per subject -> ``mri_resnet_{i}``
    columns; parquet + meta-json cached (meta records pretrained status)."""
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    stem = _cache_stem("resnet2d", manifest_path, config)
    out_path = cache_dir / f"{stem}.parquet"
    if out_path.exists():
        return pd.read_parquet(out_path)

    df = _read_manifest(manifest_path)
    embeddings, arch, dim, pretrained = _run_embed(df, config, per_slice=False)

    mat = np.stack(embeddings).astype(float)
    out = pd.DataFrame(
        {**_id_columns(df), **{f"mri_resnet_{k}": mat[:, k] for k in range(mat.shape[1])}}
    )
    out.to_parquet(out_path, index=False)
    _write_meta(cache_dir / f"{stem}.json", manifest_path, config, arch, dim, pretrained, len(df))
    return out


def load_resnet2d_embeddings(manifest_path: Path, cache_dir: Path, config: Dict) -> pd.DataFrame:
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    out_path = cache_dir / f"{_cache_stem('resnet2d', manifest_path, config)}.parquet"
    if not out_path.exists():
        raise FileNotFoundError(
            f"ResNet2D embeddings missing at {out_path}; build them with "
            "scripts/build_resnet2d_embeddings.py"
        )
    return pd.read_parquet(out_path)


def build_resnet2d_mil_embeddings(manifest_path: Path, cache_dir: Path, config: Dict) -> Path:
    """Per-slice [n_slices, emb_dim] bags -> one ``.npz``
    {embeddings, subject_id, session, label} + meta json. Returns the
    artifact path (reference script contract,
    scripts/build_resnet2d_mil_embeddings.py:162-168)."""
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    stem = _cache_stem("resnet2d_mil", manifest_path, config)
    out_path = cache_dir / f"{stem}.npz"
    if out_path.exists():
        return out_path

    df = _read_manifest(manifest_path)
    embeddings, arch, dim, pretrained = _run_embed(df, config, per_slice=True)
    ids = _id_columns(df)
    np.savez_compressed(
        out_path,
        embeddings=np.stack(embeddings),
        subject_id=ids["subject_id"],
        session=ids["session"],
        label=ids["label"],
    )
    _write_meta(cache_dir / f"{stem}.json", manifest_path, config, arch, dim, pretrained, len(df))
    return out_path


def load_resnet2d_mil_embeddings(manifest_path: Path, cache_dir: Path, config: Dict) -> pd.DataFrame:
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    out_path = cache_dir / f"{_cache_stem('resnet2d_mil', manifest_path, config)}.npz"
    if not out_path.exists():
        raise FileNotFoundError(
            f"ResNet2D MIL embeddings missing at {out_path}; build them with "
            "scripts/build_resnet2d_mil_embeddings.py"
        )
    data = np.load(out_path, allow_pickle=True)
    out = pd.DataFrame(
        {
            "subject_id": data["subject_id"],
            "session": data["session"],
            "label": data["label"],
        }
    )
    out["mri_mil"] = list(data["embeddings"])
    return out

#!/usr/bin/env python
"""Train a 3-D conv autoencoder on manifest volumes and extract bottleneck
embeddings (reference: scripts/build_cnn3d_embeddings.py).

TPU design: volumes are z-scored on device, the full multi-epoch
minibatch MSE training runs as ONE lax.scan program over the stacked
volume tensor (the dataset — tens of 96³ volumes — fits HBM comfortably:
100 volumes = 350 MB), and embeddings come from one batched forward. The
batch axis shards across a data mesh when multiple devices are present
(the reference used nn.DataParallel here — its one multi-device line).
"""
import argparse
import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np
import pandas as pd


def hash_file(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1024 * 1024)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()[:12]


def hash_config(cfg: dict) -> str:
    return hashlib.sha256(str(sorted(cfg.items())).encode()).hexdigest()[:12]


def main():
    parser = argparse.ArgumentParser(description="Build CNN embeddings for ds001907")
    parser.add_argument("--manifest", type=str, required=True)
    parser.add_argument(
        "--out-dir", type=str, default="data/processed/openneuro_ds001907/embeddings_cnn3d"
    )
    parser.add_argument("--target-shape", type=int, nargs=3, default=[96, 96, 96])
    parser.add_argument("--embedding-dim", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from pd_fusion.imaging.nifti import read_nifti
    from pd_fusion.imaging.pipeline import VolumePrefetcher
    from pd_fusion.nn.cnn3d import cnn3d_embed, cnn3d_init, train_cnn3d
    from pd_fusion.ops.image import resize3d, zscore_volume

    manifest_path = Path(args.manifest)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    cfg = {
        "target_shape": args.target_shape,
        "embedding_dim": args.embedding_dim,
        "epochs": args.epochs,
        "batch_size": args.batch_size,
        "lr": args.lr,
    }
    emb_path = out_dir / f"embeddings_{hash_file(manifest_path)}_{hash_config(cfg)}.parquet"
    meta_path = out_dir / f"embeddings_{hash_file(manifest_path)}_{hash_config(cfg)}.json"
    if emb_path.exists():
        print(f"Embeddings already cached at {emb_path}")
        return

    df = pd.read_csv(manifest_path)
    shape = tuple(args.target_shape)

    # stream volumes in with prefetch; z-score on device
    vols = [None] * len(df)
    for i, raw in VolumePrefetcher([Path(p) for p in df["t1wbrain_path"]], read_nifti, depth=4):
        vols[i] = zscore_volume(resize3d(jnp.asarray(raw), shape))
    volumes = jnp.stack(vols)[..., None]  # [N, D, H, W, 1]

    params = cnn3d_init(jax.random.PRNGKey(args.seed), shape, args.embedding_dim)

    # shard the batch across all local devices (SPMD DataParallel)
    if jax.device_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pd_fusion.utils.device import make_data_mesh

        mesh = make_data_mesh()
        volumes = jax.device_put(volumes, NamedSharding(mesh, P("data")))
        params = jax.device_put(params, NamedSharding(mesh, P()))

    params = train_cnn3d(
        params,
        volumes,
        jax.random.PRNGKey(args.seed + 1),
        args.lr,
        shape,
        args.epochs,
        min(args.batch_size, len(df)),
    )
    emb = np.asarray(cnn3d_embed(params, volumes, shape))

    emb_df = pd.DataFrame(emb, columns=[f"mri_cnn_{i}" for i in range(emb.shape[1])])
    emb_df["subject_id"] = df["subject_id"].values
    emb_df["session"] = df["session"].values
    emb_df["label"] = df["label"].values
    emb_df.to_parquet(emb_path, index=False)
    with open(meta_path, "w") as f:
        json.dump({"manifest": str(manifest_path), "config": cfg}, f, indent=2)
    print(f"Saved embeddings to {emb_path}")


if __name__ == "__main__":
    main()

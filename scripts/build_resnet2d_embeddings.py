#!/usr/bin/env python
"""Build mean-pooled ResNet2D slice embeddings for a manifest (reference:
scripts/build_resnet2d_embeddings.py). Thin CLI over
pd_fusion.data.openneuro_features.build_resnet2d_embeddings — the compute
runs through the streaming TPU pipeline (threaded NIfTI prefetch + one
fused resize/normalize/slice/ResNet program per subject)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))


def main():
    parser = argparse.ArgumentParser(description="Build ResNet2D embeddings for ds001907")
    parser.add_argument("--manifest", type=str, required=True)
    parser.add_argument(
        "--out-dir", type=str, default="data/processed/openneuro_ds001907/embeddings_resnet2d"
    )
    parser.add_argument("--backbone", type=str, default="resnet18")
    parser.add_argument("--target-shape", type=int, nargs=3, default=[160, 160, 160])
    parser.add_argument("--slice-axis", type=int, default=2)
    parser.add_argument("--slice-count", type=int, default=24)
    parser.add_argument("--input-size", type=int, default=224)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--tta", type=int, default=1)
    parser.add_argument("--max-rotation-deg", type=float, default=5.0)
    parser.add_argument("--max-translation", type=float, default=0.05)
    parser.add_argument("--intensity-scale", type=float, default=0.1)
    parser.add_argument("--intensity-shift", type=float, default=0.1)
    parser.add_argument("--noise-std", type=float, default=0.01)
    parser.add_argument("--weights-path", type=str, default=None,
                        help="Optional torchvision .pth / exported .npz backbone weights")
    args = parser.parse_args()

    config = {
        "backbone": args.backbone,
        "target_shape": tuple(args.target_shape),
        "slice_axis": args.slice_axis,
        "slice_count": args.slice_count,
        "input_size": args.input_size,
        "batch_size": args.batch_size,
        "tta": args.tta,
        "max_rotation_deg": args.max_rotation_deg,
        "max_translation": args.max_translation,
        "intensity_scale": args.intensity_scale,
        "intensity_shift": args.intensity_shift,
        "noise_std": args.noise_std,
    }
    if args.weights_path:
        config["weights_path"] = args.weights_path

    from pd_fusion.data.openneuro_features import build_resnet2d_embeddings

    df = build_resnet2d_embeddings(Path(args.manifest), Path(args.out_dir), config)
    print(f"Built {len(df)} subject embeddings -> {args.out_dir}")


if __name__ == "__main__":
    main()

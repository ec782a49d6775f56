"""A/B the embed pipeline's host->device transfer strategy on real hardware.

Two candidates for shipping a flush's subjects to the device
(imaging/pipeline.py, slices mode):

- per-subject (default): each subject is jax.device_put as host prep
  finishes (earliest possible transfer start; W relay ops + W-ary dispatch)
- stacked (PD_FUSION_STACKED_PUT=1): one host stack + ONE async
  device_put per flush (~2 relay ops per flush)

Runs the 16-volume bench embed leg N times per mode, interleaved A/B/A/B
so relay-weather drift hits both arms equally, and prints min/median.
Usage: timeout 560 python scripts/ab_stacked_put.py [reps]
"""
import os
import statistics
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax  # noqa: F401
    import numpy as np

    from bench import ensure_embed_data, run_embed_once
    from pd_fusion.nn.resnet import init_resnet

    paths = ensure_embed_data()
    params = init_resnet(jax.random.PRNGKey(0), "resnet18")
    mean = np.array([0.5, 0.5, 0.5], np.float32)
    std = np.array([0.5, 0.5, 0.5], np.float32)

    # warm both modes' programs
    os.environ.pop("PD_FUSION_STACKED_PUT", None)
    run_embed_once(paths, params, mean, std)
    os.environ["PD_FUSION_STACKED_PUT"] = "1"
    run_embed_once(paths, params, mean, std)

    walls = {"per_subject": [], "stacked": []}
    for _ in range(reps):
        os.environ.pop("PD_FUSION_STACKED_PUT", None)
        walls["per_subject"].append(run_embed_once(paths, params, mean, std))
        os.environ["PD_FUSION_STACKED_PUT"] = "1"
        walls["stacked"].append(run_embed_once(paths, params, mean, std))
    for mode, w in walls.items():
        print(
            f"{mode:12s} min {min(w):.3f}s  median {statistics.median(w):.3f}s  "
            f"all {[round(x, 3) for x in w]}"
        )


if __name__ == "__main__":
    main()

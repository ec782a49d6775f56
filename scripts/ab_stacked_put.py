"""A/B the embed pipeline's host->device transfer strategy on real hardware.

Candidates for shipping a flush's subjects to the device
(imaging/pipeline.py, slices mode):

- per-subject (default): each subject is jax.device_put as host prep
  finishes (earliest possible transfer start; W relay ops + W-ary dispatch)
- grouped (PD_FUSION_PUT_GROUP=g): one [g, L, h, w] device_put per
  g-subject block (W/g + 1 relay ops, g-granular transfer/prep overlap)

plus an orthogonal wire-width knob:

- f16 (PD_FUSION_PUT_DTYPE=f16): per-subject puts at half the bytes
  (payloads widen to f32 on device; embeddings agree to ~1e-3)

A fully-stacked one-put-per-flush mode was a 5th arm in the 2026-08-19
capture: min 4.07s vs per_subject 2.76s and the worst sample of all
five arms — it lost on both good and bad relay samples and was removed
from the pipeline.

Runs the 16-volume bench embed leg N times per mode, interleaved
A/B/C/D so relay-weather drift hits all arms equally, and prints
min/median. Usage: timeout 560 python scripts/ab_stacked_put.py [reps]
"""
import os
import statistics
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODES = {
    "per_subject": {},
    "grouped4": {"PD_FUSION_PUT_GROUP": "4"},
    "f16": {"PD_FUSION_PUT_DTYPE": "f16"},
    "f16_grouped4": {"PD_FUSION_PUT_DTYPE": "f16", "PD_FUSION_PUT_GROUP": "4"},
}


def _set_mode(env):
    for k in ("PD_FUSION_PUT_GROUP", "PD_FUSION_PUT_DTYPE"):
        os.environ.pop(k, None)
    os.environ.update(env)


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

    # warm every mode's programs
    for env in MODES.values():
        _set_mode(env)
        run_embed_once(paths, params, mean, std)

    walls = {mode: [] for mode in MODES}
    for _ in range(reps):
        for mode, env in MODES.items():
            _set_mode(env)
            walls[mode].append(run_embed_once(paths, params, mean, std))
    _set_mode({})
    for mode, w in walls.items():
        print(
            f"{mode:12s} min {min(w):.3f}s  median {statistics.median(w):.3f}s  "
            f"all {[round(x, 3) for x in w]}"
        )


if __name__ == "__main__":
    main()

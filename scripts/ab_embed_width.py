#!/usr/bin/env python
"""Interleaved A/B: embed device-program MFU vs flush width (VERDICT r4
#7 stretch probe).

SUBJECTS_PER_CALL=16 was chosen in round 3 (51.9% bf16 MFU vs 43.3% at
8 — bigger slice batches amortize weight loads on the MXU). This probes
whether 32- or 48-subject programs (768/1152-image batches at 224px)
buy more MFU, with arms interleaved per rep so relay drift cannot fake
a winner. Timing protocol = bench.measure_embed_stages: N dispatches,
ONE sync by fetching the last output.

Run on the live TPU: python scripts/ab_embed_width.py
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")

import numpy as np

from bench import (
    EMBED_INPUT,
    EMBED_SLICES,
    TPU_V5E_BF16_PEAK,
    ensure_embed_data,
    resnet18_forward_flops,
)

WIDTHS = (8, 16, 32, 48)
REPS = 3
N_CALLS = 12


def main():
    import jax
    import jax.numpy as jnp

    from pd_fusion.imaging.pipeline import embed_slices_batch, make_slices_loader
    from pd_fusion.nn.resnet import init_resnet

    paths = ensure_embed_data()
    loader = make_slices_loader((160, 160, 160), [2], [EMBED_SLICES])
    slices = [loader(p) for p in paths]
    params = init_resnet(jax.random.PRNGKey(0), "resnet18")
    mean = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    std = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)

    stacks = {}
    for w in WIDTHS:
        reps = -(-w // len(slices))
        stacks[w] = jax.device_put(
            jnp.asarray(np.stack((slices * reps)[:w]))
        )

    flops1 = resnet18_forward_flops(EMBED_INPUT) * EMBED_SLICES

    # warm every program before any timing
    for w in WIDTHS:
        np.asarray(
            embed_slices_batch(params, stacks[w], mean, std, "resnet18",
                               EMBED_INPUT, False, "bfloat16")
        )

    results = {w: [] for w in WIDTHS}
    for rep in range(REPS):
        for w in WIDTHS:  # interleaved: each rep samples every arm
            t0 = time.time()
            for _ in range(N_CALLS):
                out = embed_slices_batch(params, stacks[w], mean, std,
                                         "resnet18", EMBED_INPUT, False,
                                         "bfloat16")
            np.asarray(out)  # one sync: fetch the last output
            dt = time.time() - t0
            mfu = flops1 * w * N_CALLS / dt / TPU_V5E_BF16_PEAK
            results[w].append(round(mfu, 4))

    summary = {
        str(w): {
            "mfu_best": max(v),
            "mfu_all": v,
            "imgs_per_program": w * EMBED_SLICES,
        }
        for w, v in results.items()
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

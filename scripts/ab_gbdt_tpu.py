"""A/B the device-GBDT trainer on real hardware.

Arms:
- scatter vs onehot histogram lowering (nn/gbdt._histograms): XLA's TPU
  scatter is sort-based and may dominate; the one-hot matmul arm spends
  ~2*N*B*L*3 extra flops per feature to ride the MXU instead.
- host HistGradientBoosting as the baseline the shipped default uses.
- a vmapped 5-fold CV arm (one program for all folds) vs 5 sequential
  HistGB fits — the integration the parallel CV engine ships.

Workloads: small (N=500, F=35 — the bench CV-leg shape) and scaled
(N=20000, F=35). Each timed arm is min-of-reps with ONE sync at the end
of each rep (fetch-based, per the relay-RTT lesson in CLAUDE.md).

Usage: timeout 560 python scripts/ab_gbdt_tpu.py [reps]
(PD_FUSION_AB_GBDT_NS=500 limits the workload list — the onehot arm at
N=20000 is ~17 TFLOP, fine on TPU but minutes-to-hours on this 1-core
CPU, so CPU smokes must cap N.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")

import numpy as np


def make_data(n, f, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f)).astype(np.float32)
    logits = X @ (rng.normal(size=f) * (rng.random(f) < 0.5)) + 0.5 * X[:, 0] * X[:, 1]
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logits))).astype(np.float32)
    X[rng.random((n, f)) < 0.1] = np.nan
    return X, y


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import jax.numpy as jnp
    from sklearn.ensemble import HistGradientBoostingClassifier

    from pd_fusion.nn.gbdt import bin_features, fit_bin_edges, train_gbdt

    print(f"# backend: {jax.default_backend()} device: {jax.devices()[0]}", flush=True)
    hp = dict(n_rounds=100, depth=5, lr=0.1, lam=0.0,
              min_child_weight=1e-3, min_child_samples=20.0)
    ns = tuple(
        int(x) for x in os.environ.get("PD_FUSION_AB_GBDT_NS", "500,20000").split(",")
    )

    for n in ns:
        X, y = make_data(n, 35)
        edges = fit_bin_edges(X)
        bins = jnp.asarray(bin_features(X, edges))
        yj = jnp.asarray(y)
        w = jnp.ones_like(yj)
        base = jnp.float32(0.0)

        for mode in ("scatter", "onehot"):
            trees = train_gbdt(bins, yj, w, base, hist_mode=mode, **hp)  # warmup
            jax.tree_util.tree_leaves(trees)[0].block_until_ready()
            walls = []
            for _ in range(reps):
                t0 = time.time()
                trees = train_gbdt(bins, yj, w, base, hist_mode=mode, **hp)
                np.asarray(jax.tree_util.tree_leaves(trees)[0])  # fetch = sync
                walls.append(time.time() - t0)
            print(f"N={n} device/{mode}: min {min(walls):.3f}s  {walls}", flush=True)

        # vmapped 5-fold arm, both lowerings (2026-08-19 capture ran
        # scatter only: 50.2s at N=20000 vs 5x-sequential-onehot 4.25s —
        # the parallel CV engine's routing decision needs the onehot row)
        K = 5
        fold = np.arange(n) % K
        ws = jnp.asarray(np.stack([(fold != i).astype(np.float32) for i in range(K)]))
        bs = jnp.broadcast_to(bins, (K,) + bins.shape)
        ys = jnp.broadcast_to(yj, (K, n))
        bases = jnp.zeros(K, jnp.float32)
        for mode in ("scatter", "onehot"):
            vtrain = jax.jit(
                lambda b, y2, w2, b0, m=mode: jax.vmap(
                    lambda bb, yy, ww, bb0: train_gbdt(bb, yy, ww, bb0, hist_mode=m, **hp)
                )(b, y2, w2, b0)
            )
            trees = vtrain(bs, ys, ws, bases)
            jax.tree_util.tree_leaves(trees)[0].block_until_ready()
            walls = []
            for _ in range(reps):
                t0 = time.time()
                trees = vtrain(bs, ys, ws, bases)
                np.asarray(jax.tree_util.tree_leaves(trees)[0])
                walls.append(time.time() - t0)
            print(f"N={n} device/vmapped-5-fold/{mode}: min {min(walls):.3f}s", flush=True)

        walls = []
        for _ in range(max(1, reps - 1)):
            t0 = time.time()
            HistGradientBoostingClassifier(
                max_iter=100, max_depth=5, early_stopping=False
            ).fit(np.asarray(X), np.asarray(y))
            walls.append(time.time() - t0)
        print(f"N={n} host/histgb (1 fit): min {min(walls):.3f}s  "
              f"(x5 sequential ~ {5 * min(walls):.3f}s)")


if __name__ == "__main__":
    main()

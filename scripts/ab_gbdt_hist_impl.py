"""A/B two implementations of the GBDT one-hot histogram lowering on the
live backend: the shipped lax.map-over-features form (F sequential
(B x N) @ (N x L*3) matmuls) vs a single batched dot_general with F as a
batch dimension (einsum 'fnb,nm->fbm'). Same sums either way; this is a
pure lowering experiment — if the batched form wins on TPU it replaces
the body of hist_mode='onehot' (the public contract is unchanged).

Usage: timeout 900 python scripts/ab_gbdt_hist_impl.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import jax.numpy as jnp

    from pd_fusion.nn.gbdt import N_BINS

    print(f"# backend: {jax.default_backend()}", flush=True)
    hi = jax.lax.Precision.HIGHEST

    def hist_map(bins, data, node, n_nodes):
        n, f = bins.shape
        node1h = jax.nn.one_hot(node, n_nodes, dtype=data.dtype)
        nw = (node1h[:, :, None] * data[:, None, :]).reshape(n, n_nodes * 3)

        def one_feat(bf):
            b1h = jax.nn.one_hot(bf, N_BINS, dtype=data.dtype)
            return jnp.matmul(b1h.T, nw, precision=hi).reshape(N_BINS, n_nodes, 3)

        h = jax.lax.map(one_feat, bins.T)
        return jnp.transpose(h, (2, 0, 1, 3))

    def hist_batched(bins, data, node, n_nodes):
        n, f = bins.shape
        node1h = jax.nn.one_hot(node, n_nodes, dtype=data.dtype)
        nw = (node1h[:, :, None] * data[:, None, :]).reshape(n, n_nodes * 3)
        b1h = jax.nn.one_hot(bins.T, N_BINS, dtype=data.dtype)  # [F, N, B]
        h = jnp.einsum("fnb,nm->fbm", b1h, nw, precision=hi)
        return jnp.transpose(h.reshape(f, N_BINS, n_nodes, 3), (2, 0, 1, 3))

    rng = np.random.default_rng(0)
    for n, f, L in ((20000, 35, 16), (20000, 35, 1), (500, 35, 16), (16000, 35, 8)):
        bins = jnp.asarray(rng.integers(0, N_BINS, size=(n, f)), jnp.int32)
        data = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        node = jnp.asarray(rng.integers(0, L, size=n), jnp.int32)
        fns = {"map": jax.jit(hist_map, static_argnames="n_nodes"),
               "batched": jax.jit(hist_batched, static_argnames="n_nodes")}
        outs = {}
        for name, fn in fns.items():
            outs[name] = fn(bins, data, node, L)
            outs[name].block_until_ready()
            walls = []
            for _ in range(reps):
                t0 = time.time()
                for _ in range(20):
                    o = fn(bins, data, node, L)
                np.asarray(o)  # fetch = sync (relay lesson)
                walls.append((time.time() - t0) / 20)
            print(f"N={n} L={L} {name}: min {min(walls)*1e3:.2f} ms", flush=True)
        d = float(jnp.max(jnp.abs(outs["map"] - outs["batched"])))
        print(f"N={n} L={L} max|map-batched| = {d:.3e}", flush=True)
        assert d < 1e-4


if __name__ == "__main__":
    main()

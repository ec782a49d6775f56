"""Pallas TPU kernel: fused masked-softmax attention pooling for MIL.

The MIL head reduces a bag of L instance embeddings [L, H] to one pooled
vector via attention: softmax over masked scores, then a weighted sum
(reference models/mil_attention.py:40-51 materializes scores, weights and
the weighted product as separate tensors). This kernel fuses
mask -> stable softmax -> weighted reduction into one VMEM-resident pass
per bag: scores and weights never round-trip to HBM, and the weighted sum
runs as a [1, L] x [L, H] MXU matmul.

Grid: one program per bag. Block shapes are padded to lane width by the
caller (L, H static). Falls back to interpret mode off-TPU so tests run
anywhere; the public entry `attention_pool` dispatches pallas-on-TPU /
pure-XLA elsewhere and both paths are covered by an equivalence test.
"""
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_BAGS_PER_PROGRAM = 8  # one sublane group of bags per grid step


def _attention_pool_kernel(scores_ref, mask_ref, h_ref, out_ref, w_ref):
    scores = scores_ref[:]  # [8, L]
    mask = mask_ref[:]  # [8, L]
    h = h_ref[:]  # [8, L, H]

    masked = jnp.where(mask > 0, scores, -1e9)
    m = jnp.max(masked, axis=1, keepdims=True)
    e = jnp.exp(masked - m)
    z = jnp.sum(e, axis=1, keepdims=True)
    weights = e / z  # [8, L]

    # weighted reduction over the bag axis (VPU; Mosaic's batched
    # dot_general is unsupported in this toolchain)
    out_ref[:] = jnp.sum(weights[:, :, None] * h, axis=1)
    w_ref[:] = weights


def _pallas_pool(scores, mask, h):
    B, L = scores.shape
    H = h.shape[-1]
    G = _BAGS_PER_PROGRAM
    pad = (-B) % G
    if pad:
        scores = jnp.concatenate([scores, jnp.zeros((pad, L), scores.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad, L), mask.dtype)])
        h = jnp.concatenate([h, jnp.zeros((pad, L, H), h.dtype)])
    Bp = B + pad
    interpret = jax.default_backend() not in ("tpu",)
    pooled, weights = pl.pallas_call(
        _attention_pool_kernel,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((G, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, L), jnp.float32),
        ],
        interpret=interpret,
    )(scores, mask, h)
    return pooled[:B], weights[:B]


def _xla_pool(scores, mask, h):
    masked = jnp.where(mask > 0, scores, -1e9)
    weights = jax.nn.softmax(masked, axis=1)
    pooled = jnp.einsum("bl,blh->bh", weights, h, preferred_element_type=jnp.float32)
    return pooled, weights


@jax.custom_vjp
def attention_pool(scores, mask, h):
    """[B,L] scores, [B,L] mask, [B,L,H] instances -> ([B,H] pooled,
    [B,L] attention weights). Pallas on TPU, XLA elsewhere; identical
    numerics (equivalence-tested)."""
    return _pool_fwd_impl(scores, mask, h)[0]


def _pool_fwd_impl(scores, mask, h):
    B, L = scores.shape
    H = h.shape[-1]
    use_pallas = jax.default_backend() == "tpu" and H % 128 == 0 and L % 8 == 0
    if use_pallas:
        pooled, weights = _pallas_pool(scores, mask, h)
    else:
        pooled, weights = _xla_pool(scores, mask, h)
    return (pooled, weights), (weights, h)


def _pool_fwd(scores, mask, h):
    out, res = _pool_fwd_impl(scores, mask, h)
    return out, res


def _pool_bwd(res, g):
    weights, h = res
    g_pooled, g_weights_direct = g
    # d pooled / d weights = h ; plus any direct cotangent on weights
    g_w = jnp.einsum("bh,blh->bl", g_pooled, h) + g_weights_direct
    # softmax backward: dL/dscores = w * (g_w - sum(w * g_w))
    dot = jnp.sum(weights * g_w, axis=1, keepdims=True)
    g_scores = weights * (g_w - dot)
    # masked-out positions have weight ~0 -> gradient already ~0
    g_h = jnp.einsum("bl,bh->blh", weights, g_pooled)
    return g_scores, None, g_h


attention_pool.defvjp(_pool_fwd, _pool_bwd)

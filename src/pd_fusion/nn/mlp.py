"""Functional MLP core shared by every tabular model family.

The reference builds four near-identical torch ``nn.Sequential`` stacks
(fusion_late / fusion_masked / fusion_moddrop / unimodal_mlp — reference
models/fusion_late.py:6-22, fusion_moddrop.py:24-41). Here there is ONE
pure-functional MLP over a params pytree; model families differ only in
their input transform (mask concat, modality dropout), which is fused into
the jitted train step.

Initialization matches torch ``nn.Linear`` defaults (kaiming-uniform
U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for W and b) so learning dynamics are
statistically comparable to the reference even though the RNG stream is
jax.random rather than torch.

Numerics: the network returns LOGITS; losses use the softplus form of BCE
(bce = softplus(z) - y*z) instead of the reference's Sigmoid+BCELoss,
which is mathematically identical but stable in bf16/f32 on TPU.
"""
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

Params = List[Dict[str, jax.Array]]


def linear_init(wkey: jax.Array, bkey: jax.Array, fan_in: int, fan_out: int):
    """torch nn.Linear default init: U(+-1/sqrt(fan_in)) for both w and b.
    mil_init reuses it with its own key split so those families draw
    identically to their torch twins. NOTE: cnn3d keeps a separate
    ``_linear_init`` on purpose — it computes the bound in host float64
    and consumes keys differently, and changing either would break
    reproducibility of existing cnn3d checkpoints."""
    bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1)).astype(jnp.float32)
    return {
        "w": jax.random.uniform(wkey, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bkey, (fan_out,), jnp.float32, -bound, bound),
    }


def mlp_init(key: jax.Array, dims: Sequence[int]) -> Params:
    """dims = [in, h1, ..., hk, out]."""
    params: Params = []
    for i in range(len(dims) - 1):
        key, wk, bk = jax.random.split(key, 3)
        params.append(linear_init(wk, bk, dims[i], dims[i + 1]))
    return params


def mlp_apply(
    params: Params,
    x: jax.Array,
    *,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Forward pass -> logits [N]. Hidden layers: Linear-ReLU-Dropout.

    Dropout is inverted (scale by 1/keep) and only applied when a key is
    provided (i.e. during training), mirroring torch semantics.
    """
    h = x
    n_layers = len(params)
    for i, layer in enumerate(params):
        h = jnp.dot(h, layer["w"], preferred_element_type=jnp.float32) + layer["b"]
        if i < n_layers - 1:
            h = jax.nn.relu(h)
            if dropout_rate > 0.0 and dropout_key is not None:
                dropout_key, sub = jax.random.split(dropout_key)
                keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, h.shape)
                h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)
    return h[..., 0]


def bce_with_logits(logits: jax.Array, y: jax.Array, weights: Optional[jax.Array] = None) -> jax.Array:
    """Weighted-mean binary cross-entropy on logits.

    Padded samples (weight 0) contribute nothing; the mean divides by the
    total weight so a padded batch reproduces the unpadded batch mean.
    """
    l = jax.nn.softplus(logits) - y * logits
    if weights is None:
        return jnp.mean(l)
    # An all-padding batch (total weight 0) is reachable when ragged
    # group-kfold folds pad past batch_size; maximum(t, 1e-38) is a
    # flushed-to-zero subnormal under XLA, so it still yielded 0/0 = nan
    # grads that poisoned the fold. The numerator is already 0 there, so
    # a safe denominator gives loss 0 with exactly-zero gradients.
    t = jnp.sum(weights)
    return jnp.sum(l * weights) / jnp.where(t > 0, t, 1.0)

"""Missingness-conditioned Mixture-of-Experts, stacked-expert formulation.

Reference semantics (src/pd_fusion/models/moe.py): one dense expert MLP
per modality computed SERIALLY, a router MLP over the [N, M] availability
mask producing softmax weights, output = sum_m w_m * sigmoid(expert_m);
full-batch Adam + BCE, validation ignored.

TPU design: experts are STACKED — per-modality inputs are zero-padded to
a common feature width and all experts run as one batched einsum
('mnf,mfh->mnh') that the MXU executes as a single batched matmul; the
router and the convex combination fuse into the same program. Padded
weight rows receive exactly-zero gradients (their inputs are zero), so
stacking is mathematically identical to the serial reference. No
routing-based dispatch (EP) is needed: there are 3 dense experts
(SURVEY §2.6).
"""
from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import optax


def moe_init(key, modality_dims: Dict[str, int], expert_hidden: Sequence[int], router_hidden: Sequence[int]):
    """Returns a params pytree:
    experts: list over layers of {'w': [M, in, out], 'b': [M, out]}
    router:  list over layers of {'w': [in, out],   'b': [out]}
    plus static layout info handled by the caller.
    """
    mods = sorted(modality_dims.keys())
    M = len(mods)
    f_max = max(modality_dims[m] for m in mods)
    layer_dims = [f_max, *expert_hidden, 1]

    experts: List[Dict[str, jax.Array]] = []
    for li in range(len(layer_dims) - 1):
        ws, bs = [], []
        for mod in mods:
            key, wk, bk = jax.random.split(key, 3)
            # torch Linear init with the TRUE per-expert fan_in on layer 0
            fan_in = modality_dims[mod] if li == 0 else layer_dims[li]
            bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1)).astype(jnp.float32)
            w = jax.random.uniform(
                wk, (layer_dims[li], layer_dims[li + 1]), jnp.float32, -bound, bound
            )
            if li == 0:
                # rows beyond the expert's true input dim correspond to padding
                row_idx = jnp.arange(layer_dims[li])[:, None]
                w = jnp.where(row_idx < modality_dims[mod], w, 0.0)
            b = jax.random.uniform(bk, (layer_dims[li + 1],), jnp.float32, -bound, bound)
            ws.append(w)
            bs.append(b)
        experts.append({"w": jnp.stack(ws), "b": jnp.stack(bs)})

    router_dims = [M, *router_hidden, M]
    router: List[Dict[str, jax.Array]] = []
    for li in range(len(router_dims) - 1):
        key, wk, bk = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(jnp.maximum(router_dims[li], 1)).astype(jnp.float32)
        router.append(
            {
                "w": jax.random.uniform(
                    wk, (router_dims[li], router_dims[li + 1]), jnp.float32, -bound, bound
                ),
                "b": jax.random.uniform(bk, (router_dims[li + 1],), jnp.float32, -bound, bound),
            }
        )
    return {"experts": experts, "router": router}


def moe_apply(params, x_stack: jax.Array, mask: jax.Array) -> jax.Array:
    """x_stack: [M, N, Fmax] zero-padded per-modality inputs; mask: [N, M].
    Returns combined probability [N]."""
    h = x_stack
    n_layers = len(params["experts"])
    for li, layer in enumerate(params["experts"]):
        h = jnp.einsum("mnf,mfh->mnh", h, layer["w"], preferred_element_type=jnp.float32)
        h = h + layer["b"][:, None, :]
        if li < n_layers - 1:
            h = jax.nn.relu(h)
    expert_probs = jax.nn.sigmoid(h[..., 0])  # [M, N]

    r = mask
    for li, layer in enumerate(params["router"]):
        r = jnp.dot(r, layer["w"], preferred_element_type=jnp.float32) + layer["b"]
        if li < len(params["router"]) - 1:
            r = jax.nn.relu(r)
    weights = jax.nn.softmax(r, axis=1)  # [N, M]

    return jnp.sum(weights * expert_probs.T, axis=1)


def _moe_loss(params, x_stack, mask, y):
    p = jnp.clip(moe_apply(params, x_stack, mask), 1e-7, 1.0 - 1e-7)
    return -jnp.mean(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))


@partial(jax.jit, static_argnames=("epochs", "weight_decay"))
def train_moe(params, x_stack, mask, y, lr: float, epochs: int, weight_decay: float = 0.0):
    """Full-batch Adam, all epochs in one lax.scan program."""
    tx = (
        optax.chain(optax.add_decayed_weights(weight_decay), optax.adam(lr))
        if weight_decay > 0
        else optax.adam(lr)
    )
    opt_state = tx.init(params)

    def step(carry, _):
        p, s = carry
        grads = jax.grad(_moe_loss)(p, x_stack, mask, y)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), None

    (params, _), _ = jax.lax.scan(step, (params, opt_state), None, length=epochs)
    return params


moe_predict = jax.jit(moe_apply)

"""3-D convolutional autoencoder for volume embeddings.

Reference architecture (scripts/build_cnn3d_embeddings.py:55-86
``Simple3DAE``): encoder = 3 x [Conv3d(k3, pad 1) + ReLU + MaxPool3d(2)]
with channels 1->8->16->32, fc bottleneck to ``embedding_dim``, decoder =
fc + 3 x ConvTranspose3d(k2, stride 2); MSE reconstruction training, then
bottleneck embeddings are extracted per subject.

TPU design: NDHWC layout, lax 3-D convs (MXU), the whole multi-epoch
minibatch training as one lax.scan program; batch axis shardable over a
data mesh via NamedSharding (the reference's only multi-device line is
``nn.DataParallel`` here — SURVEY §2.6 — and this is its SPMD
equivalent).
"""
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _conv3d(x, w, b, stride=1):
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,) * 3,
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return out + b


def _deconv3d(x, w, b):
    # ConvTranspose3d(kernel 2, stride 2): exact upsampling transpose
    out = jax.lax.conv_transpose(
        x,
        w,
        strides=(2, 2, 2),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out + b


def _maxpool3d(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 2, 1),
        window_strides=(1, 2, 2, 2, 1),
        padding="VALID",
    )


def _kaiming_conv(key, kd, kh, kw, cin, cout):
    fan_in = kd * kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    k1, k2 = jax.random.split(key)
    w = jax.random.uniform(k1, (kd, kh, kw, cin, cout), jnp.float32, -bound, bound)
    b = jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def _linear_init(key, fan_in, fan_out):
    bound = float(np.sqrt(1.0 / fan_in))
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (fan_out,), jnp.float32, -bound, bound),
    }


def ae_enc_shape(input_shape: Tuple[int, int, int]) -> Tuple[int, int, int, int]:
    d, h, w = input_shape
    return (d // 8, h // 8, w // 8, 32)


def cnn3d_init(key, input_shape=(96, 96, 96), embedding_dim=128) -> Dict:
    ks = jax.random.split(key, 8)
    es = ae_enc_shape(input_shape)
    enc_dim = int(np.prod(es))
    return {
        "enc1": _kaiming_conv(ks[0], 3, 3, 3, 1, 8),
        "enc2": _kaiming_conv(ks[1], 3, 3, 3, 8, 16),
        "enc3": _kaiming_conv(ks[2], 3, 3, 3, 16, 32),
        "fc": _linear_init(ks[3], enc_dim, embedding_dim),
        "fc_dec": _linear_init(ks[4], embedding_dim, enc_dim),
        "dec1": _kaiming_conv(ks[5], 2, 2, 2, 32, 16),
        "dec2": _kaiming_conv(ks[6], 2, 2, 2, 16, 8),
        "dec3": _kaiming_conv(ks[7], 2, 2, 2, 8, 1),
    }


def cnn3d_apply(params, x, input_shape):
    """x: [N, D, H, W, 1] -> (reconstruction [N, D, H, W, 1], emb [N, E])."""
    z = _maxpool3d(jax.nn.relu(_conv3d(x, params["enc1"]["w"], params["enc1"]["b"])))
    z = _maxpool3d(jax.nn.relu(_conv3d(z, params["enc2"]["w"], params["enc2"]["b"])))
    z = _maxpool3d(jax.nn.relu(_conv3d(z, params["enc3"]["w"], params["enc3"]["b"])))
    n = z.shape[0]
    es = ae_enc_shape(input_shape)
    z_flat = z.reshape(n, -1)
    emb = jnp.dot(z_flat, params["fc"]["w"], preferred_element_type=jnp.float32) + params["fc"]["b"]
    r = jnp.dot(emb, params["fc_dec"]["w"], preferred_element_type=jnp.float32) + params["fc_dec"]["b"]
    r = r.reshape(n, *es)
    # decoder deconv weights are [2,2,2,cin,cout] for conv_transpose
    r = jax.nn.relu(_deconv3d(r, params["dec1"]["w"], params["dec1"]["b"]))
    r = jax.nn.relu(_deconv3d(r, params["dec2"]["w"], params["dec2"]["b"]))
    r = _deconv3d(r, params["dec3"]["w"], params["dec3"]["b"])
    return r, emb


@partial(jax.jit, static_argnames=("input_shape", "epochs", "batch_size"))
def train_cnn3d(params, volumes, key, lr: float, input_shape, epochs: int, batch_size: int):
    """MSE reconstruction training, all epochs in one scan. volumes:
    [N, D, H, W, 1]."""
    n = volumes.shape[0]
    n_batches = -(-n // batch_size)
    pad = n_batches * batch_size - n
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, xb, wb):
        recon, _ = cnn3d_apply(p, xb, input_shape)
        per = jnp.mean((recon - xb) ** 2, axis=(1, 2, 3, 4))
        # safe denominator (1e-38 is subnormal -> flushed to 0 by XLA;
        # an all-padding batch then made 0/0 nan grads)
        t = jnp.sum(wb)
        return jnp.sum(per * wb) / jnp.where(t > 0, t, 1.0)

    def epoch_step(carry, ek):
        p, s = carry
        perm = jax.random.permutation(ek, n)
        idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)]).reshape(n_batches, batch_size)
        wpad = jnp.concatenate(
            [jnp.ones((n,), volumes.dtype), jnp.zeros((pad,), volumes.dtype)]
        ).reshape(n_batches, batch_size)

        def batch_step(c, inp):
            p, s = c
            bidx, bw = inp
            grads = jax.grad(loss_fn)(p, volumes[bidx], bw)
            updates, s = tx.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), None

        (p, s), _ = jax.lax.scan(batch_step, (p, s), (idx, wpad))
        return (p, s), None

    ekeys = jax.random.split(key, epochs)
    (params, _), _ = jax.lax.scan(epoch_step, (params, opt_state), ekeys)
    return params


@partial(jax.jit, static_argnames=("input_shape",))
def cnn3d_embed(params, volumes, input_shape):
    _, emb = cnn3d_apply(params, volumes, input_shape)
    return emb

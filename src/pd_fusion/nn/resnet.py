"""Functional ResNet-18/50 in JAX (NHWC, TPU-native).

Replaces the reference's torchvision backbone (reference data/
openneuro_features.py:153-164 builds resnet18/50 with fc=Identity and runs
slice batches through it). Design:
- NHWC layout + lax.conv_general_dilated: the layout XLA prefers on TPU
  (channels on the 128-lane axis; convs hit the MXU).
- Params are a pytree whose structure mirrors torchvision's state_dict
  names, so ``convert_torch_state_dict`` is a mechanical transpose — when
  a user supplies real ImageNet weights (torchvision .pth or an exported
  .npz) the embeddings match the reference's. In this zero-egress image
  no pretrained weights exist, so ``init_resnet`` provides a seeded
  He-normal init and the builders record ``pretrained: false`` in their
  cache metadata (documented deviation — the reference would have
  downloaded ImageNet weights).
- BatchNorm: inference mode uses running stats folded to scale/bias;
  train mode uses batch statistics. The fine-tune path uses
  ``resnet_apply_train``, which additionally returns EMA-updated running
  stats (torch ``.train()`` semantics, momentum 0.1, unbiased-var
  update) that the train step grafts back into the params pytree.

ImageNet preprocessing constants (mean/std) match torchvision's
weights.meta (reference :215-222).
"""
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_CONFIGS = {
    "resnet18": {"block": "basic", "layers": [2, 2, 2, 2], "expansion": 1, "emb_dim": 512},
    "resnet50": {"block": "bottleneck", "layers": [3, 4, 6, 3], "expansion": 4, "emb_dim": 2048},
}


def _conv(x, w, stride=1, padding=None):
    # torch uses symmetric padding k//2; XLA's "SAME" is asymmetric for
    # even strides, so pad explicitly for exact torch parity
    if padding is None:
        kh, kw = w.shape[0], w.shape[1]
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    # accumulation type follows the compute dtype: f32 path unchanged;
    # bf16 path keeps activations bf16 (MXU still accumulates f32
    # internally before the cast)
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=w.dtype,
    )


def _bn(x, p, train: bool):
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
    else:
        mean, var = p["mean"], p["var"]
    inv = jax.lax.rsqrt(var + 1e-5)
    return (x - mean) * inv * p["gamma"] + p["beta"]


def _he_conv(key, kh, kw, cin, cout):
    fan_out = kh * kw * cout  # torch kaiming fan_out mode for resnet convs
    std = np.sqrt(2.0 / fan_out)
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c):
    return {
        "gamma": jnp.ones((c,), jnp.float32),
        "beta": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_resnet(key, arch: str = "resnet18") -> Dict[str, Any]:
    cfg = _CONFIGS[arch]
    exp = cfg["expansion"]
    params: Dict[str, Any] = {}
    key, k = jax.random.split(key)
    params["conv1"] = {"w": _he_conv(k, 7, 7, 3, 64)}
    params["bn1"] = _bn_init(64)

    cin = 64
    for li, (n_blocks, cout) in enumerate(zip(cfg["layers"], [64, 128, 256, 512])):
        blocks: List[Dict[str, Any]] = []
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            block: Dict[str, Any] = {}
            if cfg["block"] == "basic":
                key, k1, k2, kd = jax.random.split(key, 4)
                block["conv1"] = {"w": _he_conv(k1, 3, 3, cin, cout)}
                block["bn1"] = _bn_init(cout)
                block["conv2"] = {"w": _he_conv(k2, 3, 3, cout, cout)}
                block["bn2"] = _bn_init(cout)
                out_c = cout
            else:
                key, k1, k2, k3, kd = jax.random.split(key, 5)
                block["conv1"] = {"w": _he_conv(k1, 1, 1, cin, cout)}
                block["bn1"] = _bn_init(cout)
                block["conv2"] = {"w": _he_conv(k2, 3, 3, cout, cout)}
                block["bn2"] = _bn_init(cout)
                block["conv3"] = {"w": _he_conv(k3, 1, 1, cout, cout * exp)}
                block["bn3"] = _bn_init(cout * exp)
                out_c = cout * exp
            if stride != 1 or cin != out_c:
                block["downsample"] = {
                    "conv": {"w": _he_conv(kd, 1, 1, cin, out_c)},
                    "bn": _bn_init(out_c),
                }
            blocks.append(block)
            cin = out_c
        params[f"layer{li + 1}"] = blocks
    return params


def _basic_block(x, p, stride, train):
    identity = x
    out = _conv(x, p["conv1"]["w"], stride=stride)
    out = jax.nn.relu(_bn(out, p["bn1"], train))
    out = _conv(out, p["conv2"]["w"], stride=1)
    out = _bn(out, p["bn2"], train)
    if "downsample" in p:
        identity = _bn(_conv(x, p["downsample"]["conv"]["w"], stride=stride), p["downsample"]["bn"], train)
    return jax.nn.relu(out + identity)


def _bottleneck_block(x, p, stride, train):
    identity = x
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]["w"], stride=1), p["bn1"], train))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"]["w"], stride=stride), p["bn2"], train))
    out = _bn(_conv(out, p["conv3"]["w"], stride=1), p["bn3"], train)
    if "downsample" in p:
        identity = _bn(_conv(x, p["downsample"]["conv"]["w"], stride=stride), p["downsample"]["bn"], train)
    return jax.nn.relu(out + identity)


def resnet_apply(params, x, arch: str = "resnet18", train: bool = False):
    """x: [N, H, W, 3] -> embeddings [N, emb_dim] (global-avg-pooled; the
    classification fc is never constructed, matching fc=Identity).

    During training each residual block is rematerialized
    (``jax.checkpoint``): activations are recomputed in the backward pass
    instead of stored, trading ~30% extra FLOPs for an order-of-magnitude
    activation-memory cut — what lets 64-slice 224² fine-tune bags fit
    HBM (SURVEY's remat guidance)."""
    cfg = _CONFIGS[arch]
    block_fn = _basic_block if cfg["block"] == "basic" else _bottleneck_block
    if train:
        block_fn = jax.checkpoint(block_fn, static_argnums=(2, 3))

    out = _conv(x, params["conv1"]["w"], stride=2, padding=((3, 3), (3, 3)))
    out = jax.nn.relu(_bn(out, params["bn1"], train))
    # torch maxpool(3, stride 2, padding 1): pad with -inf then reduce
    out = jax.lax.reduce_window(
        out,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for li in range(4):
        for bi, block in enumerate(params[f"layer{li + 1}"]):
            stride = 2 if (li > 0 and bi == 0) else 1
            out = block_fn(out, block, stride, train)
    return jnp.mean(out, axis=(1, 2))  # global average pool -> [N, emb_dim]


def emb_dim(arch: str) -> int:
    return _CONFIGS[arch]["emb_dim"]


# ---------------------------------------------------------------------------
# train-mode forward with BN running-stat EMA (torch .train() semantics)
# ---------------------------------------------------------------------------


def _bn_train(x, p, momentum, w=None):
    """Batch-stat normalization + EMA running-stat update. Matches torch
    BatchNorm2d train mode exactly: normalize with biased batch variance,
    update running_var with the UNBIASED estimate, momentum 0.1 default.

    ``w`` (optional, [N] 0/1 per-image weights) restricts the batch
    statistics to the weighted images, so batches padded to a fixed
    program shape compute the SAME statistics as the unpadded batch —
    the padded images are still normalized (their outputs are masked
    downstream) but contribute nothing to mean/var or the EMA."""
    if w is None:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
    else:
        wb = w[:, None, None, None]
        n = jnp.sum(w) * (x.shape[1] * x.shape[2])
        mean = jnp.sum(x * wb, axis=(0, 1, 2)) / n
        var = jnp.sum(jnp.square(x - mean) * wb, axis=(0, 1, 2)) / n
        unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
    new_p = dict(
        p,
        mean=(1.0 - momentum) * p["mean"] + momentum * mean,
        var=(1.0 - momentum) * p["var"] + momentum * unbiased,
    )
    inv = jax.lax.rsqrt(var + 1e-5)
    return (x - mean) * inv * p["gamma"] + p["beta"], new_p


def _basic_block_train(x, p, stride, momentum, w=None):
    new_p = dict(p)
    identity = x
    out = _conv(x, p["conv1"]["w"], stride=stride)
    out, new_p["bn1"] = _bn_train(out, p["bn1"], momentum, w)
    out = jax.nn.relu(out)
    out = _conv(out, p["conv2"]["w"], stride=1)
    out, new_p["bn2"] = _bn_train(out, p["bn2"], momentum, w)
    if "downsample" in p:
        identity, ds_bn = _bn_train(
            _conv(x, p["downsample"]["conv"]["w"], stride=stride), p["downsample"]["bn"], momentum, w
        )
        new_p["downsample"] = dict(p["downsample"], bn=ds_bn)
    return jax.nn.relu(out + identity), new_p


def _bottleneck_block_train(x, p, stride, momentum, w=None):
    new_p = dict(p)
    identity = x
    out, new_p["bn1"] = _bn_train(_conv(x, p["conv1"]["w"], stride=1), p["bn1"], momentum, w)
    out = jax.nn.relu(out)
    out, new_p["bn2"] = _bn_train(_conv(out, p["conv2"]["w"], stride=stride), p["bn2"], momentum, w)
    out = jax.nn.relu(out)
    out, new_p["bn3"] = _bn_train(_conv(out, p["conv3"]["w"], stride=1), p["bn3"], momentum, w)
    if "downsample" in p:
        identity, ds_bn = _bn_train(
            _conv(x, p["downsample"]["conv"]["w"], stride=stride), p["downsample"]["bn"], momentum, w
        )
        new_p["downsample"] = dict(p["downsample"], bn=ds_bn)
    return jax.nn.relu(out + identity), new_p


def resnet_apply_train(params, x, arch: str = "resnet18", momentum: float = 0.1, sample_weight=None):
    """Train-mode forward returning (embeddings, params-with-updated-BN-
    running-stats). Mirrors the reference backbone running in torch
    ``.train()`` mode, where every forward updates running stats
    (reference: models/mil_attention_finetune.py:147-151 via module
    train-mode defaults). Blocks are rematerialized as in
    ``resnet_apply(train=True)``. ``sample_weight`` ([N] 0/1) restricts
    every BN batch statistic to the weighted images (see ``_bn_train``)
    so shape-padded batches are statistics-exact."""
    cfg = _CONFIGS[arch]
    block_fn = _basic_block_train if cfg["block"] == "basic" else _bottleneck_block_train
    block_fn = jax.checkpoint(block_fn, static_argnums=(2, 3))

    new_params = dict(params)
    out = _conv(x, params["conv1"]["w"], stride=2, padding=((3, 3), (3, 3)))
    out, new_params["bn1"] = _bn_train(out, params["bn1"], momentum, sample_weight)
    out = jax.nn.relu(out)
    out = jax.lax.reduce_window(
        out,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for li in range(4):
        new_blocks = []
        for bi, block in enumerate(params[f"layer{li + 1}"]):
            stride = 2 if (li > 0 and bi == 0) else 1
            out, nb = block_fn(out, block, stride, momentum, sample_weight)
            new_blocks.append(nb)
        new_params[f"layer{li + 1}"] = new_blocks
    return jnp.mean(out, axis=(1, 2)), new_params


def _is_bn_stat(path) -> bool:
    last = path[-1]
    key = getattr(last, "key", None)
    return key in ("mean", "var")


def merge_bn_stats(trained_params, stats_params):
    """Graft BN running stats from ``stats_params`` onto ``trained_params``
    (everything else — conv weights, gamma/beta — comes from the trained
    tree). Used after an optimizer step whose forward produced EMA stats."""
    return jax.tree_util.tree_map_with_path(
        lambda path, t, s: s if _is_bn_stat(path) else t, trained_params, stats_params
    )


def bn_buffer_mask(params):
    """Bool pytree marking NON-buffer leaves (True = apply weight decay).
    torch's Adam(weight_decay=..) decays parameters (incl. BN gamma/beta)
    but never the running-stat buffers."""
    return jax.tree_util.tree_map_with_path(lambda path, _: not _is_bn_stat(path), params)


# ---------------------------------------------------------------------------
# inference-time BN folding
# ---------------------------------------------------------------------------


def _fold_pair(conv_p, bn_p):
    """Algebraically exact fold of an inference BN into its conv:
    (conv(x, w) - mean) * rsqrt(var+eps) * gamma + beta
      == conv(x, w * s) + (beta - mean * s)   with s = gamma*rsqrt(var+eps).
    Per-channel scale rides the HWIO output axis."""
    s = bn_p["gamma"] * jax.lax.rsqrt(bn_p["var"] + 1e-5)
    return {"w": conv_p["w"] * s[None, None, None, :], "b": bn_p["beta"] - bn_p["mean"] * s}


def fold_bn_inference(params, arch: str = "resnet18"):
    """Fold every BatchNorm's running stats + affine into the preceding
    conv's weights, returning a bias-carrying conv-only pytree for
    ``resnet_apply_folded``. Removes the per-activation scale/bias pass
    from the inference path (HBM-bandwidth win on TPU: the BN math moves
    from an O(N*H*W*C) activation sweep into an O(K*K*Cin*Cout) weight
    transform done once per program)."""
    cfg = _CONFIGS[arch]
    n_convs = 2 if cfg["block"] == "basic" else 3
    folded = {"conv1": _fold_pair(params["conv1"], params["bn1"])}
    for li in range(4):
        blocks = []
        for block in params[f"layer{li + 1}"]:
            fb = {
                f"conv{ci}": _fold_pair(block[f"conv{ci}"], block[f"bn{ci}"])
                for ci in range(1, n_convs + 1)
            }
            if "downsample" in block:
                fb["downsample"] = _fold_pair(block["downsample"]["conv"], block["downsample"]["bn"])
            blocks.append(fb)
        folded[f"layer{li + 1}"] = blocks
    return folded


def _basic_block_folded(x, p, stride):
    identity = x
    out = jax.nn.relu(_conv(x, p["conv1"]["w"], stride=stride) + p["conv1"]["b"])
    out = _conv(out, p["conv2"]["w"], stride=1) + p["conv2"]["b"]
    if "downsample" in p:
        identity = _conv(x, p["downsample"]["w"], stride=stride) + p["downsample"]["b"]
    return jax.nn.relu(out + identity)


def _bottleneck_block_folded(x, p, stride):
    identity = x
    out = jax.nn.relu(_conv(x, p["conv1"]["w"], stride=1) + p["conv1"]["b"])
    out = jax.nn.relu(_conv(out, p["conv2"]["w"], stride=stride) + p["conv2"]["b"])
    out = _conv(out, p["conv3"]["w"], stride=1) + p["conv3"]["b"]
    if "downsample" in p:
        identity = _conv(x, p["downsample"]["w"], stride=stride) + p["downsample"]["b"]
    return jax.nn.relu(out + identity)


def resnet_apply_folded(folded, x, arch: str = "resnet18"):
    """Inference forward over a BN-folded pytree (``fold_bn_inference``):
    equals ``resnet_apply(params, x, train=False)`` to f32 rounding,
    with every BN collapsed into its conv. x: [N,H,W,3] -> [N, emb_dim]."""
    cfg = _CONFIGS[arch]
    block_fn = _basic_block_folded if cfg["block"] == "basic" else _bottleneck_block_folded
    # stem stays a direct 7x7/s2 conv: a space-to-depth 4x4/s1 rewrite was
    # measured SLOWER on this toolchain (bf16 B=16: 46.7% vs 51.9% MFU) —
    # XLA's own lowering already handles the 3-channel stem well
    out = _conv(x, folded["conv1"]["w"], stride=2, padding=((3, 3), (3, 3)))
    out = jax.nn.relu(out + folded["conv1"]["b"])
    out = jax.lax.reduce_window(
        out,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for li in range(4):
        for bi, block in enumerate(folded[f"layer{li + 1}"]):
            stride = 2 if (li > 0 and bi == 0) else 1
            out = block_fn(out, block, stride)
    return jnp.mean(out, axis=(1, 2))


# ---------------------------------------------------------------------------
# torchvision weight conversion
# ---------------------------------------------------------------------------


def convert_torch_state_dict(sd: Dict[str, Any], arch: str = "resnet18") -> Dict[str, Any]:
    """Map a torchvision resnet state_dict (tensors or numpy arrays) onto
    our pytree. Conv weights [O,I,KH,KW] -> HWIO."""

    def arr(v):
        a = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        return jnp.asarray(a, jnp.float32)

    def conv_w(name):
        return {"w": jnp.transpose(arr(sd[name]), (2, 3, 1, 0))}

    def bn_p(prefix):
        return {
            "gamma": arr(sd[f"{prefix}.weight"]),
            "beta": arr(sd[f"{prefix}.bias"]),
            "mean": arr(sd[f"{prefix}.running_mean"]),
            "var": arr(sd[f"{prefix}.running_var"]),
        }

    cfg = _CONFIGS[arch]
    params: Dict[str, Any] = {
        "conv1": conv_w("conv1.weight"),
        "bn1": bn_p("bn1"),
    }
    n_convs = 2 if cfg["block"] == "basic" else 3
    for li, n_blocks in enumerate(cfg["layers"]):
        blocks = []
        for bi in range(n_blocks):
            pre = f"layer{li + 1}.{bi}"
            block: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                block[f"conv{ci}"] = conv_w(f"{pre}.conv{ci}.weight")
                block[f"bn{ci}"] = bn_p(f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": conv_w(f"{pre}.downsample.0.weight"),
                    "bn": bn_p(f"{pre}.downsample.1"),
                }
            blocks.append(block)
        params[f"layer{li + 1}"] = blocks
    return params


def load_backbone(arch: str = "resnet18", weights_path=None, seed: int = 0):
    """Build backbone params: from an .npz/.pth export when provided (or
    via torchvision if importable with cached weights), else seeded
    random init. Returns (params, emb_dim, pretrained: bool)."""
    if weights_path is not None:
        import pickle

        p = str(weights_path)
        if p.endswith(".npz"):
            data = np.load(p)
            sd = {k: data[k] for k in data.files}
        else:
            try:
                import torch

                sd = torch.load(p, map_location="cpu", weights_only=True)
            except Exception:
                with open(p, "rb") as f:
                    sd = pickle.load(f)
        return convert_torch_state_dict(sd, arch), _CONFIGS[arch]["emb_dim"], True

    try:  # pragma: no cover - torchvision absent in this image
        from torchvision.models import ResNet18_Weights, ResNet50_Weights, resnet18, resnet50

        if arch == "resnet50":
            model = resnet50(weights=ResNet50_Weights.DEFAULT)
        else:
            model = resnet18(weights=ResNet18_Weights.DEFAULT)
        return (
            convert_torch_state_dict(model.state_dict(), arch),
            _CONFIGS[arch]["emb_dim"],
            True,
        )
    except Exception:
        return init_resnet(jax.random.PRNGKey(seed), arch), _CONFIGS[arch]["emb_dim"], False

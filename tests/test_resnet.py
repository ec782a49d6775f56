"""ResNet numerical parity vs a hand-built torch oracle with torchvision's
exact architecture and state_dict naming (torchvision itself is absent in
this image, so the oracle is constructed in-test)."""
import numpy as np
import pytest
import torch
import torch.nn as nn

from pd_fusion.nn.resnet import convert_torch_state_dict, emb_dim, init_resnet, resnet_apply
from pd_fusion.utils.torch_utils import build_torch_resnet18

# shared with test_embed_parity; the oracle module itself lives in
# pd_fusion.utils.torch_utils so the reference-baseline script can use it
_TorchResNet18 = build_torch_resnet18


def test_resnet18_matches_torch_oracle():
    # TPU MXU runs f32 convs via bf16 passes by default; force full f32
    # for the numerical-parity check (production keeps the fast default)
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        _run_oracle_check()
    finally:
        jax.config.update("jax_default_matmul_precision", None)


def _run_oracle_check():
    torch.manual_seed(0)
    model = _TorchResNet18().eval()
    # random running stats to exercise the BN path
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)

    sd = model.state_dict()
    params = convert_torch_state_dict(sd, "resnet18")

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)  # small input for speed
    with torch.no_grad():
        expect = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(resnet_apply(params, x, "resnet18", train=False))
    assert got.shape == expect.shape == (2, 512)
    np.testing.assert_allclose(got, expect, atol=2e-4)


def test_resnet_shapes_and_determinism():
    import jax

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    # resnet50: shape only (small input keeps the compile cheap)
    params50 = init_resnet(jax.random.PRNGKey(0), "resnet50")
    assert np.asarray(resnet_apply(params50, x, "resnet50")).shape == (1, emb_dim("resnet50"))
    # resnet18: determinism of seeded init
    params = init_resnet(jax.random.PRNGKey(0), "resnet18")
    out = np.asarray(resnet_apply(params, x, "resnet18"))
    assert out.shape == (1, emb_dim("resnet18"))
    params2 = init_resnet(jax.random.PRNGKey(0), "resnet18")
    np.testing.assert_allclose(out, np.asarray(resnet_apply(params2, x, "resnet18")))


def test_bn_folding_equals_unfolded_inference():
    """fold_bn_inference + resnet_apply_folded == resnet_apply(train=False)
    to f32 rounding, on a backbone with non-trivial running stats."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pd_fusion.nn.resnet import (
        fold_bn_inference,
        init_resnet,
        resnet_apply,
        resnet_apply_folded,
    )

    params = init_resnet(jax.random.PRNGKey(3), "resnet18")

    # randomize BN stats/affine so the fold is exercised (init has
    # mean=0/var=1/gamma=1/beta=0 which would fold to identity)
    def spice(path, leaf):
        key = getattr(path[-1], "key", None)
        if key in ("mean", "beta"):
            return leaf + 0.1 * np.random.RandomState(len(path)).randn(*leaf.shape).astype(np.float32)
        if key in ("var", "gamma"):
            return leaf * (1.0 + 0.2 * np.random.RandomState(len(path) + 7).rand(*leaf.shape).astype(np.float32))
        return leaf

    params = jax.tree_util.tree_map_with_path(spice, params)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32))

    # prove the fold at HIGHEST matmul precision: TPU's DEFAULT f32 conv
    # runs bf16 MXU passes, so scaling W *before* the bf16 rounding
    # (folded) vs after (unfolded) legitimately drifts ~1e-2 over 18
    # layers — a backend rounding mode, not a folding bug. HIGHEST gives
    # true-f32 conv semantics on every backend; the algebraic identity is
    # what this test pins.
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(
            jax.jit(lambda p, v: resnet_apply(p, v, "resnet18", train=False))(params, x)
        )
        folded = fold_bn_inference(params, "resnet18")
        got = np.asarray(jax.jit(lambda p, v: resnet_apply_folded(p, v, "resnet18"))(folded, x))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

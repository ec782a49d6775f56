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

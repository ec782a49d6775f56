"""ResNet numerical parity vs a hand-built torch oracle with torchvision's
exact architecture and state_dict naming (torchvision itself is absent in
this image, so the oracle is constructed in-test)."""
import numpy as np
import pytest
import torch
import torch.nn as nn

from pd_fusion.nn.resnet import convert_torch_state_dict, emb_dim, init_resnet, resnet_apply


class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return torch.relu(out + idt)


class _TorchResNet18(nn.Module):
    """torchvision-resnet18-shaped module with matching state_dict names."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(_BasicBlock(64, 64), _BasicBlock(64, 64))
        self.layer2 = nn.Sequential(_BasicBlock(64, 128, 2), _BasicBlock(128, 128))
        self.layer3 = nn.Sequential(_BasicBlock(128, 256, 2), _BasicBlock(256, 256))
        self.layer4 = nn.Sequential(_BasicBlock(256, 512, 2), _BasicBlock(512, 512))
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return self.avgpool(x).flatten(1)


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

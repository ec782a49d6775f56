"""Deep numerical equivalence vs torch.

1. The full-batch Adam scan trainer reproduces torch's Adam trajectory
   step-for-step when both start from IDENTICAL weights (same data, no
   dropout): final parameters and predictions match to float tolerance.
   This pins optimizer semantics (Adam bias correction, lr, eps) and the
   BCE-with-logits formulation against the reference stack.
2. The stacked-expert MoE einsum equals a serial per-expert computation
   (the reference's loop) exactly.
"""
import numpy as np
import pytest
import torch


def test_fullbatch_trainer_matches_torch_adam_trajectory():
    import jax

    # 50 chained optimizer steps amplify the MXU's bf16-pass rounding into
    # visible trajectory divergence; force full f32 for the equivalence check
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        _check_adam_trajectory()
    finally:
        jax.config.update("jax_default_matmul_precision", None)


def _check_adam_trajectory():
    import jax
    import jax.numpy as jnp

    from pd_fusion.nn.trainer import train_fullbatch

    rng = np.random.RandomState(0)
    n, d, h = 64, 5, 8
    X = rng.randn(n, d).astype(np.float32)
    y = rng.randint(0, 2, n).astype(np.float32)

    torch.manual_seed(0)
    net = torch.nn.Sequential(
        torch.nn.Linear(d, h), torch.nn.ReLU(), torch.nn.Linear(h, 1)
    )
    # export torch's init into our params pytree
    params = [
        {"w": jnp.asarray(net[0].weight.detach().numpy().T),
         "b": jnp.asarray(net[0].bias.detach().numpy())},
        {"w": jnp.asarray(net[2].weight.detach().numpy().T),
         "b": jnp.asarray(net[2].bias.detach().numpy())},
    ]

    epochs, lr = 50, 1e-2
    opt = torch.optim.Adam(net.parameters(), lr=lr)
    crit = torch.nn.BCEWithLogitsLoss()
    Xt, yt = torch.from_numpy(X), torch.from_numpy(y)
    for _ in range(epochs):
        opt.zero_grad()
        loss = crit(net(Xt).squeeze(1), yt)
        loss.backward()
        opt.step()

    trained = train_fullbatch(
        params, X, y, None, jax.random.PRNGKey(0), lr, epochs, 0.0, 0.0
    )

    # tolerance note: both sides are identical math in exact arithmetic
    # (verified: wrong lr/eps/bias-correction diverge at the 1e-1 scale);
    # the residual is fp32 reduction-order drift amplified over 50 chained
    # Adam steps.
    np.testing.assert_allclose(
        np.asarray(trained[0]["w"]), net[0].weight.detach().numpy().T, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(trained[1]["w"]), net[2].weight.detach().numpy().T, atol=5e-3
    )
    with torch.no_grad():
        p_torch = torch.sigmoid(net(Xt).squeeze(1)).numpy()
    from pd_fusion.nn.trainer import predict_proba_jit

    p_jax = np.asarray(predict_proba_jit(trained, X))
    np.testing.assert_allclose(p_jax, p_torch, atol=2e-3)


def test_stacked_moe_equals_serial_experts():
    import jax
    import jax.numpy as jnp

    from pd_fusion.nn.moe import moe_apply, moe_init

    rng = np.random.RandomState(1)
    dims = {"clinical": 4, "datspect": 2, "mri": 6}
    mods = sorted(dims)
    n = 30
    params = moe_init(jax.random.PRNGKey(0), dims, [8, 4], [6])
    X = {m: rng.randn(n, dims[m]).astype(np.float32) for m in mods}
    mask = rng.randint(0, 2, (n, 3)).astype(np.float32)

    f_max = max(dims.values())
    x_stack = np.zeros((3, n, f_max), np.float32)
    for mi, m in enumerate(mods):
        x_stack[mi, :, : dims[m]] = X[m]
    combined = np.asarray(moe_apply(params, jnp.asarray(x_stack), jnp.asarray(mask)))

    # serial oracle: per-expert MLP on its own (unpadded) input
    def serial_expert(mi, x):
        h = x
        for li, layer in enumerate(params["experts"]):
            w = np.asarray(layer["w"][mi])
            b = np.asarray(layer["b"][mi])
            if li == 0:
                w = w[: x.shape[1]]  # padded rows are zero anyway
            h = h @ w + b
            if li < len(params["experts"]) - 1:
                h = np.maximum(h, 0)
        return 1.0 / (1.0 + np.exp(-h[:, 0]))

    r = mask
    for li, layer in enumerate(params["router"]):
        r = r @ np.asarray(layer["w"]) + np.asarray(layer["b"])
        if li < len(params["router"]) - 1:
            r = np.maximum(r, 0)
    r = np.exp(r - r.max(axis=1, keepdims=True))
    weights = r / r.sum(axis=1, keepdims=True)

    expect = sum(weights[:, mi] * serial_expert(mi, X[m]) for mi, m in enumerate(mods))
    # atol covers the MXU's bf16-pass rounding on TPU
    np.testing.assert_allclose(combined, expect, atol=5e-4)

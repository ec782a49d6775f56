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


def _make_problem():
    rng = np.random.RandomState(0)
    n, d, h = 64, 5, 8
    X = rng.randn(n, d).astype(np.float32)
    y = rng.randint(0, 2, n).astype(np.float32)
    torch.manual_seed(0)
    net = torch.nn.Sequential(
        torch.nn.Linear(d, h), torch.nn.ReLU(), torch.nn.Linear(h, 1)
    )
    return X, y, net


def _export_params(net):
    import jax.numpy as jnp

    # np.array COPIES: on the CPU backend jnp.asarray can zero-copy-alias
    # a contiguous numpy view of a torch tensor, and torch's in-place
    # opt.step() would then silently mutate the "frozen" JAX params
    return [
        {"w": jnp.asarray(np.array(net[0].weight.detach().numpy().T)),
         "b": jnp.asarray(np.array(net[0].bias.detach().numpy()))},
        {"w": jnp.asarray(np.array(net[2].weight.detach().numpy().T)),
         "b": jnp.asarray(np.array(net[2].bias.detach().numpy()))},
    ]


def _run_torch(net, X, y, epochs, lr):
    opt = torch.optim.Adam(net.parameters(), lr=lr)
    crit = torch.nn.BCEWithLogitsLoss()
    Xt, yt = torch.from_numpy(X), torch.from_numpy(y)
    for _ in range(epochs):
        opt.zero_grad()
        loss = crit(net(Xt).squeeze(1), yt)
        loss.backward()
        opt.step()


def test_fullbatch_trainer_matches_torch_adam_exact_steps():
    """Semantics proof: after 1 and 2 full-batch Adam steps from identical
    weights, our params equal torch's to near-fp32-ulp tolerance on ANY
    backend. One/two steps don't amplify reduction-order differences, so
    this is backend-stable — it pins the gradient (BCE-with-logits), Adam
    bias correction, lr and eps exactly (a wrong lr/eps/bias-correction
    diverges at the 1e-3..1e-1 scale even after one step)."""
    import jax

    from pd_fusion.nn.trainer import train_fullbatch

    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        X, y, _ = _make_problem()
        lr = 1e-2
        for steps in (1, 2):
            torch.manual_seed(0)
            net = torch.nn.Sequential(
                torch.nn.Linear(X.shape[1], 8), torch.nn.ReLU(), torch.nn.Linear(8, 1)
            )
            params = _export_params(net)
            _run_torch(net, X, y, steps, lr)
            trained = train_fullbatch(
                params, X, y, None, jax.random.PRNGKey(0), lr, steps, 0.0, 0.0
            )
            np.testing.assert_allclose(
                np.asarray(trained[0]["w"]), net[0].weight.detach().numpy().T,
                atol=5e-5, err_msg=f"layer0 after {steps} step(s)",
            )
            np.testing.assert_allclose(
                np.asarray(trained[0]["b"]), net[0].bias.detach().numpy(),
                atol=5e-5, err_msg=f"layer0 bias after {steps} step(s)",
            )
            np.testing.assert_allclose(
                np.asarray(trained[1]["w"]), net[2].weight.detach().numpy().T,
                atol=5e-5, err_msg=f"layer1 after {steps} step(s)",
            )
    finally:
        jax.config.update("jax_default_matmul_precision", None)


def test_fullbatch_trainer_torch_adam_trajectory_band():
    """Trajectory band: 50 chained Adam steps amplify 1-ulp backend
    rounding chaotically (observed max-abs weight drift 0.75 between CPU
    and TPU backends running the SAME math), so exact equality over long
    horizons proves bit-luck, not semantics. Instead assert both
    optimizers reach an equally good solution: final training BCE within
    a small absolute band and predictions close in the mean."""
    import jax

    from pd_fusion.nn.trainer import predict_proba_jit, train_fullbatch

    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        X, y, net = _make_problem()
        params = _export_params(net)
        epochs, lr = 50, 1e-2
        _run_torch(net, X, y, epochs, lr)
        trained = train_fullbatch(
            params, X, y, None, jax.random.PRNGKey(0), lr, epochs, 0.0, 0.0
        )
        with torch.no_grad():
            p_torch = torch.sigmoid(net(torch.from_numpy(X)).squeeze(1)).numpy()
        p_jax = np.asarray(predict_proba_jit(trained, X))

        def bce(p):
            p = np.clip(p, 1e-7, 1 - 1e-7)
            return float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p)))

        # band widths chosen from the observed cross-backend drift of the
        # SAME program (CPU vs TPU: loss delta 0.04, pred MAE ~0.05) with
        # 2x headroom; a semantic optimizer bug (wrong lr / eps / bias
        # correction) shifts the 50-step loss by 0.3+.
        assert abs(bce(p_jax) - bce(p_torch)) < 1e-1, (bce(p_jax), bce(p_torch))
        assert float(np.mean(np.abs(p_jax - p_torch))) < 1e-1
        # rank agreement: the two trajectories order the samples the same way
        from scipy.stats import spearmanr

        rho = spearmanr(p_jax, p_torch).statistic
        assert rho > 0.9, rho
    finally:
        jax.config.update("jax_default_matmul_precision", None)


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

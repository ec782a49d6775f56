"""MIL attention tests: pallas/XLA pool equivalence, learning, missing-bag
handling, save/load."""
import numpy as np
import pytest

from pd_fusion.utils.seed import set_seed


def test_attention_pool_pallas_matches_xla():
    import jax
    import jax.numpy as jnp

    from pd_fusion.ops.pallas_mil import _pallas_pool, _xla_pool

    rng = np.random.RandomState(0)
    B, L, H = 4, 16, 128
    scores = rng.randn(B, L).astype(np.float32)
    mask = (rng.rand(B, L) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    h = rng.randn(B, L, H).astype(np.float32)

    p1, w1 = _pallas_pool(jnp.asarray(scores), jnp.asarray(mask), jnp.asarray(h))
    p2, w2 = _xla_pool(jnp.asarray(scores), jnp.asarray(mask), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_attention_pool_grad_matches_autodiff():
    import jax
    import jax.numpy as jnp

    from pd_fusion.ops.pallas_mil import _xla_pool, attention_pool

    rng = np.random.RandomState(1)
    B, L, H = 2, 8, 16
    scores = jnp.asarray(rng.randn(B, L).astype(np.float32))
    mask = jnp.asarray((rng.rand(B, L) > 0.2).astype(np.float32))
    h = jnp.asarray(rng.randn(B, L, H).astype(np.float32))

    f_custom = lambda s, hh: jnp.sum(attention_pool(s, mask, hh)[0] ** 2)
    f_ref = lambda s, hh: jnp.sum(_xla_pool(s, mask, hh)[0] ** 2)
    gs_c, gh_c = jax.grad(f_custom, argnums=(0, 1))(scores, h)
    gs_r, gh_r = jax.grad(f_ref, argnums=(0, 1))(scores, h)
    np.testing.assert_allclose(np.asarray(gs_c), np.asarray(gs_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh_c), np.asarray(gh_r), atol=1e-4)


def _make_bags(n=120, d=16, seed=0):
    """Positive bags contain a few 'signal' instances."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 2, n)
    bags = []
    for i in range(n):
        L = rng.randint(5, 20)
        bag = rng.randn(L, d).astype(np.float32)
        if y[i] == 1:
            k = rng.randint(1, 4)
            bag[rng.choice(L, k, replace=False)] += 2.5
        bags.append(bag)
    return bags, y


@pytest.mark.parametrize("gated", [False, True])
def test_mil_attention_learns(gated, tmp_path):
    from sklearn.metrics import roc_auc_score

    from pd_fusion.models.mil_attention import MilAttentionModel

    set_seed(0)
    bags, y = _make_bags()
    val_bags, y_val = _make_bags(40, seed=1)
    m = MilAttentionModel(
        16,
        {
            "hidden_dim": 32,
            "attn_dim": 16,
            "dropout": 0.1,
            "gated": gated,
            "lr": 5e-3,
            "batch_size": 16,
            "epochs": 40,
            "class_weight": "balanced",
            "max_grad_norm": 5.0,
            "early_stopping_patience": 10,
        },
    )
    m.train(bags, y, (val_bags, y_val))
    p = m.predict_proba(val_bags)
    assert roc_auc_score(y_val, p) > 0.8

    m.save(tmp_path / "mil.pt")
    m2 = MilAttentionModel.load(tmp_path / "mil.pt")
    np.testing.assert_allclose(p, m2.predict_proba(val_bags), atol=1e-6)


def test_mil_missing_bags_get_constant():
    from pd_fusion.models.mil_attention import MilAttentionModel

    set_seed(0)
    bags, y = _make_bags(60)
    m = MilAttentionModel(16, {"hidden_dim": 16, "attn_dim": 8, "epochs": 3,
                               "missing_prob": 0.42})
    m.train(bags, y)
    test_bags = [bags[0], None, bags[1]]
    mri_mask = np.array([1, 1, 0])
    p = m.predict_proba(test_bags, {"mri": mri_mask})
    assert p[1] == pytest.approx(0.42)
    assert p[2] == pytest.approx(0.42)
    assert p[0] != pytest.approx(0.42)

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvsdf_tpu.fields.embedder import positional_encoding, embed_dim
from mvsdf_tpu.fields import sdf as sdf_mod
from mvsdf_tpu.fields import radiance as rad_mod
from mvsdf_tpu.fields.sdf import (ImplicitConfig, init_implicit,
                                  implicit_apply, sdf_apply,
                                  sdf_value_and_grad)


def test_embed_dim_and_shape():
    x = jnp.ones((5, 3))
    for L in [0, 4, 6]:
        y = positional_encoding(x, L)
        assert y.shape == (5, embed_dim(L, 3))
    # multires=6 on 3 dims -> 39
    assert embed_dim(6, 3) == 39


def test_embed_values():
    x = jnp.array([[0.3, -0.2, 0.7]])
    y = positional_encoding(x, 2)
    np.testing.assert_allclose(np.asarray(y[0, :3]), np.asarray(x[0]))
    np.testing.assert_allclose(np.asarray(y[0, 3:6]), np.sin(np.asarray(x[0])),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y[0, 6:9]), np.cos(np.asarray(x[0])),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y[0, 9:12]),
                               np.sin(2 * np.asarray(x[0])), rtol=1e-6)


def test_geometric_init_approximates_sphere():
    cfg = ImplicitConfig()
    params = init_implicit(cfg, np.random.default_rng(0))
    # SDF at radius-|bias| sphere should be near zero; center negative;
    # outside positive.
    pts = np.random.default_rng(1).normal(size=(256, 3))
    pts_on = pts / np.linalg.norm(pts, axis=1, keepdims=True) * cfg.bias
    s_on = np.asarray(sdf_apply(cfg, params, jnp.asarray(pts_on, jnp.float32)))
    assert np.abs(s_on).max() < 0.3  # approximate sphere init
    s_center = float(sdf_apply(cfg, params, jnp.zeros((1, 3)))[0])
    assert s_center < -0.1
    pts_out = pts_on * 1.5
    s_out = np.asarray(sdf_apply(cfg, params, jnp.asarray(pts_out, jnp.float32)))
    assert (s_out > 0).all()


def test_output_shapes():
    cfg = ImplicitConfig()
    params = init_implicit(cfg, np.random.default_rng(0))
    x = jnp.zeros((7, 3))
    out = implicit_apply(cfg, params, x)
    assert out.shape == (7, 1 + 1 + cfg.feature_vector_size)


def test_sdf_grad_matches_finite_differences():
    cfg = ImplicitConfig(dims=(64,) * 4, skip_in=(2,))
    params = init_implicit(cfg, np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(2).uniform(-0.8, 0.8, (16, 3)),
                    jnp.float32)
    _, g = sdf_value_and_grad(cfg, params, x)
    eps = 1e-3
    for d in range(3):
        dx = jnp.zeros((1, 3)).at[0, d].set(eps)
        fd = (sdf_apply(cfg, params, x + dx) -
              sdf_apply(cfg, params, x - dx)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[:, d]), np.asarray(fd),
                                   atol=2e-3)


def test_eikonal_near_unity_at_init():
    # Geometric init should give |grad| close to 1 (approximate SDF).
    cfg = ImplicitConfig()
    params = init_implicit(cfg, np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(3).uniform(-0.9, 0.9, (128, 3)),
                    jnp.float32)
    _, g = sdf_value_and_grad(cfg, params, x)
    norms = np.asarray(jnp.linalg.norm(g, axis=-1))
    assert np.abs(norms - 1).mean() < 0.2


def test_sdf_grad_is_differentiable_wrt_params():
    cfg = ImplicitConfig(dims=(64,) * 3, skip_in=(2,))
    params = init_implicit(cfg, np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(4).uniform(-0.5, 0.5, (8, 3)),
                    jnp.float32)

    def eik(p):
        _, g = sdf_value_and_grad(cfg, p, x)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1) ** 2)

    grads = jax.grad(eik)(params)
    total = sum(float(jnp.abs(leaf).sum())
                for leaf in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_render_field_shapes_and_range():
    cfg = rad_mod.RenderConfig()
    params = rad_mod.init_render(cfg, np.random.default_rng(0))
    n = 11
    rng = np.random.default_rng(5)
    rgb = rad_mod.render_apply(
        cfg, params,
        jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(n, cfg.feature_vector_size)),
                    jnp.float32))
    assert rgb.shape == (n, 3)
    assert float(jnp.abs(rgb).max()) <= 1.0


@pytest.mark.slow
def test_bf16_activations_close_to_f32():
    """bf16 activation storage must keep outputs, spatial grads, and param
    grads within bf16-rounding distance of the f32 path (PERF.md quality
    study validates end-to-end training quality)."""
    import dataclasses
    from mvsdf_tpu.fields.sdf import full_value_and_grad
    cfg = ImplicitConfig()
    cfgb = dataclasses.replace(cfg, bf16_activations=True)
    params = init_implicit(cfg, np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(1).uniform(-0.8, 0.8, (256, 3)),
                    jnp.float32)
    o1, g1 = full_value_and_grad(cfg, params, x)
    o2, g2 = full_value_and_grad(cfgb, params, x)
    assert o2.dtype == jnp.float32 and g2.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(o1[:, 0])))
    assert float(jnp.max(jnp.abs(o1[:, 0] - o2[:, 0]))) < 0.02 * scale
    assert float(jnp.max(jnp.abs(g1 - g2))) < 0.03 * float(
        jnp.max(jnp.abs(g1)))

    def loss(p, c):
        o, g = full_value_and_grad(c, p, x)
        return jnp.mean(o[:, 0] ** 2) + jnp.mean(
            (jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    t1 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(p, cfg))(params))
    t2 = jax.tree_util.tree_leaves(jax.grad(lambda p: loss(p, cfgb))(params))
    for a, b in zip(t1, t2):
        assert float(jnp.max(jnp.abs(a - b))) < 0.05 * (
            float(jnp.max(jnp.abs(a))) + 1e-6)

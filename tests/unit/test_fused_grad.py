"""Fused custom-VJP value+gradient (fields/fused_grad.py) vs the plain
jax.vjp/autodiff path: primal outputs, spatial gradients, and — the part the
custom VJP replaces — parameter and input gradients of a loss that consumes
both outputs (value heads + eikonal-style gradient norm), including the
skip connection and positional encoding second-derivative term."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsdf_tpu.fields.sdf import (ImplicitConfig, init_implicit,
                                  implicit_apply, full_value_and_grad)



pytestmark = pytest.mark.slow  # guards the non-default fused_value_grad option

def _cfg(**kw):
    base = dict(feature_vector_size=8, dims=(32, 32, 32, 32), skip_in=(2,),
                multires=4, bias=0.6, fused_value_grad=True)
    base.update(kw)
    return ImplicitConfig(**base)


def _loss(cfg, params, x):
    out, g = full_value_and_grad(cfg, params, x)
    # touches every output path: sdf head, indicator head, feature head,
    # and the gradient (eikonal + a directional term that exercises the
    # full Hessian, not just its norm)
    eik = jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
    dirs = jnp.sin(x * 3.0)
    return (jnp.mean(out[..., 0] ** 2) + 0.3 * jnp.mean(out[..., 1:] ** 2) +
            eik + 0.7 * jnp.mean(jnp.sum(g * dirs, -1)))


@pytest.mark.parametrize("skip", [(), (2,)])
@pytest.mark.parametrize("multires", [0, 4])
def test_fused_matches_autodiff(skip, multires):
    cfg_f = _cfg(skip_in=skip, multires=multires)
    cfg_a = dataclasses.replace(cfg_f, fused_value_grad=False)
    params = init_implicit(cfg_f, np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -0.9, 0.9, (257, 3)).astype(np.float32))

    out_f, g_f = full_value_and_grad(cfg_f, params, x)
    out_a, g_a = full_value_and_grad(cfg_a, params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_a), atol=1e-5)
    # primal value also equals the plain forward
    np.testing.assert_allclose(np.asarray(out_f),
                               np.asarray(implicit_apply(cfg_f, params, x)),
                               atol=1e-6)

    lf, gradf = jax.value_and_grad(lambda p, xx: _loss(cfg_f, p, xx),
                                   argnums=(0, 1))(params, x)
    la, grada = jax.value_and_grad(lambda p, xx: _loss(cfg_a, p, xx),
                                   argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(lf), float(la), rtol=1e-6)
    for tf, ta in zip(jax.tree_util.tree_leaves(gradf),
                      jax.tree_util.tree_leaves(grada)):
        scale = np.abs(np.asarray(ta)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(tf) / scale,
                                   np.asarray(ta) / scale, atol=2e-5)


def test_fused_matches_autodiff_leading_dims():
    cfg_f = _cfg()
    params = init_implicit(cfg_f, np.random.default_rng(2))
    x = jnp.asarray(np.random.default_rng(3).uniform(
        -0.9, 0.9, (4, 33, 3)).astype(np.float32))
    out, g = full_value_and_grad(cfg_f, params, x)
    assert out.shape == (4, 33, 2 + cfg_f.feature_vector_size)
    assert g.shape == (4, 33, 3)
    cfg_a = dataclasses.replace(cfg_f, fused_value_grad=False)
    out_a, g_a = full_value_and_grad(cfg_a, params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_a), atol=1e-5)


def test_fused_second_order_vs_finite_difference():
    """The Hessian path (gradient-output cotangent -> input cotangent) vs
    central finite differences of the loss."""
    cfg = _cfg(dims=(24, 24), skip_in=(), multires=3)
    params = init_implicit(cfg, np.random.default_rng(4))
    x0 = np.random.default_rng(5).uniform(-0.8, 0.8, (5, 3)).astype(
        np.float32)

    def loss_np(xnp):
        return float(_loss(cfg, params, jnp.asarray(xnp)))

    gx = np.asarray(jax.grad(lambda xx: _loss(cfg, params, xx))(
        jnp.asarray(x0)))
    eps = 1e-3
    for i in range(3):
        dx = np.zeros_like(x0)
        dx[2, i] = eps
        fd = (loss_np(x0 + dx) - loss_np(x0 - dx)) / (2 * eps)
        assert abs(fd - gx[2, i]) < 5e-3 + 5e-3 * abs(fd), (i, fd, gx[2, i])

"""Fused march kernel (interpret mode) vs the XLA _sphere_trace."""
import pytest
import numpy as np
import jax.numpy as jnp

from mvsdf_tpu.fields.sdf import ImplicitConfig, init_implicit, sdf_apply
from mvsdf_tpu.tracing.sphere_trace import TracerConfig, _sphere_trace
from mvsdf_tpu.tracing.pallas import pack_sdf_weights
from mvsdf_tpu.tracing.pallas.march_kernel import pallas_sphere_trace


def _scene(n=300, seed=0, spread=0.9):
    rng = np.random.default_rng(seed)
    cam = np.tile(np.array([[0.1, 0.2, 2.2]], np.float32), (n, 1))
    targets = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    dirs = targets - cam
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(cam), jnp.asarray(dirs)


def _intersect(org, dirs, r=1.0):
    d_dot_o = jnp.sum(dirs * org, axis=-1)
    under = d_dot_o ** 2 - (jnp.sum(org ** 2, axis=-1) - r ** 2)
    mi = under > 0
    sq = jnp.sqrt(jnp.where(mi, under, 0.0))
    tn = jnp.clip(jnp.where(mi, -d_dot_o - sq, 0.0), 0.0)
    tf = jnp.clip(jnp.where(mi, -d_dot_o + sq, 0.0), 0.0)
    return mi, tn, tf


@pytest.mark.slow
def test_fused_march_matches_xla_march():
    icfg = ImplicitConfig(feature_vector_size=16, dims=(64,) * 3,
                          skip_in=(2,), multires=6, bias=0.6)
    params = init_implicit(icfg, np.random.default_rng(0))
    tcfg = TracerConfig(sphere_tracing_iters=8, n_steps=16,
                        n_secant_steps=4, sample_chunk=0)
    org, dirs = _scene()
    mi, tn, tf = _intersect(org, dirs)

    sdf = lambda x: sdf_apply(icfg, params, x)
    ref_unfin, ref_ts, ref_te = _sphere_trace(tcfg, sdf, org, dirs, mi, tn,
                                              tf)
    packed = pack_sdf_weights(icfg, params)
    unfin, ts, te = pallas_sphere_trace(tcfg, icfg, packed, org, dirs, mi,
                                        tn, tf, block=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(unfin), np.asarray(ref_unfin))
    np.testing.assert_allclose(np.asarray(ts), np.asarray(ref_ts), atol=3e-5)
    np.testing.assert_allclose(np.asarray(te), np.asarray(ref_te), atol=3e-5)


def test_fused_march_leading_shape():
    icfg = ImplicitConfig(feature_vector_size=16, dims=(64,) * 2,
                          skip_in=(), multires=4)
    params = init_implicit(icfg, np.random.default_rng(1))
    tcfg = TracerConfig(sphere_tracing_iters=5)
    org, dirs = _scene(n=256, seed=2)
    org = org.reshape(2, 128, 3)
    dirs = dirs.reshape(2, 128, 3)
    mi, tn, tf = _intersect(org, dirs)
    packed = pack_sdf_weights(icfg, params)
    unfin, ts, te = pallas_sphere_trace(tcfg, icfg, packed, org, dirs, mi,
                                        tn, tf, block=128, interpret=True)
    assert ts.shape == (2, 128)
    sdf = lambda x: sdf_apply(icfg, params, x)
    _, ref_ts, _ = _sphere_trace(tcfg, sdf, org, dirs, mi, tn, tf)
    np.testing.assert_allclose(np.asarray(ts), np.asarray(ref_ts), atol=3e-5)

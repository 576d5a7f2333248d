"""Fused secant kernel (interpret mode) vs the XLA-driven _secant, and the
full trace with secant_fn wired vs without."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mvsdf_tpu.fields.sdf import ImplicitConfig, init_implicit, sdf_apply
from mvsdf_tpu.tracing.sphere_trace import TracerConfig, _secant, trace_rays
from mvsdf_tpu.tracing.pallas import pack_sdf_weights, pallas_secant

ICFG = ImplicitConfig(feature_vector_size=16, dims=(64,) * 3, skip_in=(2,),
                      multires=6)


def setup(n=256, seed=0):
    params = init_implicit(ICFG, np.random.default_rng(seed))
    packed = pack_sdf_weights(ICFG, params)
    rng = np.random.default_rng(seed + 1)
    org = jnp.asarray(np.tile([[0.0, 0.0, -1.5]], (n, 1)), jnp.float32)
    tgt = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    dirs = tgt - np.asarray(org)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    z_low = jnp.asarray(rng.uniform(0.5, 1.0, n).astype(np.float32))
    z_high = z_low + jnp.asarray(rng.uniform(0.1, 0.5, n).astype(np.float32))
    sdf = lambda x: sdf_apply(ICFG, params, x)
    sdf_low = sdf(org + z_low[:, None] * dirs)
    sdf_high = sdf(org + z_high[:, None] * dirs)
    return params, packed, sdf, org, dirs, z_low, z_high, sdf_low, sdf_high


def test_secant_kernel_matches_xla():
    params, packed, sdf, org, dirs, zl, zh, sl, sh = setup()
    cfg = TracerConfig()
    ref = _secant(cfg, sdf, org, dirs, zl, zh, sl, sh)
    got = pallas_secant(cfg, ICFG, packed, org, dirs, zl, zh, sl, sh,
                        block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_trace_with_secant_fn_matches():
    params, packed, sdf, org, dirs, *_ = setup()
    cfg = TracerConfig(n_steps=20, sample_chunk=0)
    om = jnp.ones(org.shape[0], bool)
    steps = jnp.asarray(
        np.random.default_rng(7).uniform(size=cfg.n_steps), jnp.float32)
    secant_fn = lambda o, d, zl, zh, sl, sh: pallas_secant(
        cfg, ICFG, packed, o, d, zl, zh, sl, sh, block=128, interpret=True)
    base = trace_rays(cfg, sdf, org, dirs, om, training=True,
                      minimal_steps=steps)
    fused = trace_rays(cfg, sdf, org, dirs, om, training=True,
                       minimal_steps=steps, secant_fn=secant_fn)
    np.testing.assert_array_equal(np.asarray(base.network_object_mask),
                                  np.asarray(fused.network_object_mask))
    np.testing.assert_allclose(np.asarray(base.dists),
                               np.asarray(fused.dists), atol=1e-5)
    np.testing.assert_allclose(np.asarray(base.points),
                               np.asarray(fused.points), atol=1e-5)

"""Pallas fused SDF kernel vs the reference jnp field (interpret mode on
CPU; the same kernel compiles via Mosaic on real TPU)."""
import numpy as np
import jax.numpy as jnp

from mvsdf_tpu.fields.sdf import ImplicitConfig, init_implicit, sdf_apply
from mvsdf_tpu.tracing.pallas import pack_sdf_weights, make_pallas_sdf_fn


def _check(cfg, n=700, seed=0, atol=2e-5):
    params = init_implicit(cfg, np.random.default_rng(seed))
    packed = pack_sdf_weights(cfg, params)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (n, 3)),
                    jnp.float32)
    ref = np.asarray(sdf_apply(cfg, params, x))
    for in_kernel_pe in (False, True):
        fn = make_pallas_sdf_fn(cfg, packed, block=256, interpret=True,
                                in_kernel_pe=in_kernel_pe)
        np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=atol,
                                   rtol=1e-5)


def test_pallas_sdf_full_size_topology():
    _check(ImplicitConfig())  # 512x8, skip at 4, multires 6


def test_pallas_sdf_small_topology():
    _check(ImplicitConfig(feature_vector_size=32, dims=(64,) * 4,
                          skip_in=(2,)))


def test_pallas_sdf_no_skip():
    _check(ImplicitConfig(feature_vector_size=16, dims=(128,) * 3,
                          skip_in=()))


def test_pallas_sdf_leading_shapes():
    cfg = ImplicitConfig(feature_vector_size=16, dims=(64,) * 3, skip_in=())
    params = init_implicit(cfg, np.random.default_rng(0))
    packed = pack_sdf_weights(cfg, params)
    fn = make_pallas_sdf_fn(cfg, packed, block=256, interpret=True)
    x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (4, 33, 3)),
                    jnp.float32)
    out = fn(x)
    assert out.shape == (4, 33)
    ref = sdf_apply(cfg, params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)

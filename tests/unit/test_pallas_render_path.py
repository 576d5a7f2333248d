"""The use_pallas_trace renderer path (interpret mode on CPU) must agree
with the jnp path end to end."""
import pytest
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mvsdf_tpu.config import ModelConfig
from mvsdf_tpu.fields.sdf import ImplicitConfig
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.rendering import render_forward
from mvsdf_tpu.train.step import init_params
from mvsdf_tpu.config import MVSDFConfig

from tests.golden.scene_fixtures import make_scene


pytestmark = pytest.mark.slow  # interpret-mode Pallas render path

FEAT = 16


def test_pallas_trace_path_matches_jnp_path():
    base = ModelConfig(
        implicit=ImplicitConfig(feature_vector_size=FEAT, dims=(64,) * 3,
                                skip_in=(2,), multires=6),
        render=RenderConfig(feature_vector_size=FEAT, dims=(64,),
                            multires_view=4),
        tracer=TracerConfig(sphere_tracing_iters=5, n_steps=20,
                            n_secant_steps=4, sample_chunk=0))
    cfg_pallas = dataclasses.replace(base, use_pallas_trace=True,
                                     pallas_interpret=True,
                                     pallas_block=128)
    params = init_params(
        MVSDFConfig(model=base), seed=0)
    scene = make_scene(n_images=2, n_pix=64, feat_ch=FEAT, seed=5)
    inputs = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    noise = {"minimal_steps": jnp.asarray(
        np.random.default_rng(1).uniform(size=20).astype(np.float32)),
        "eik_points": jnp.asarray(np.random.default_rng(2).uniform(
            -1, 1, (64, 3)).astype(np.float32))}

    out_a = render_forward(base, params, inputs, training=True, noise=noise)
    out_b = render_forward(cfg_pallas, params, inputs, training=True,
                           noise=noise)
    cfg_march = dataclasses.replace(cfg_pallas, use_pallas_march=True,
                                    pallas_march_block=128)
    out_c = render_forward(cfg_march, params, inputs, training=True,
                           noise=noise)
    cfg_inkpe = dataclasses.replace(cfg_pallas, pallas_in_kernel_pe=True)
    out_d = render_forward(cfg_inkpe, params, inputs, training=True,
                           noise=noise)
    for out_x in (out_b, out_c, out_d):
        np.testing.assert_array_equal(np.asarray(out_a.network_object_mask),
                                      np.asarray(out_x.network_object_mask))
        np.testing.assert_allclose(np.asarray(out_a.dists),
                                   np.asarray(out_x.dists), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_a.rgb_values),
                                   np.asarray(out_x.rgb_values), atol=1e-4)

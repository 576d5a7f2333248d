"""The Pallas kernel path must be multi-chip-legal: shard_map trace with
use_pallas_trace (fused SDF kernel per device, interpret mode on CPU) must
equal the global-jit XLA trace on the 8-device CPU mesh."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvsdf_tpu.config import MVSDFConfig, ModelConfig, Schedule, TrainConfig
from mvsdf_tpu.fields.sdf import ImplicitConfig
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                  weights_to_array)
from mvsdf_tpu.parallel import make_mesh, device_put_batch

from tests.golden.scene_fixtures import make_scene

FEAT = 16


def _cfg(shard_map_trace=False, pallas=False, march=False, compact=False):
    tcfg = TracerConfig(sphere_tracing_iters=5, n_steps=20,
                        n_secant_steps=4, sample_chunk=0)
    if compact:
        tcfg = dataclasses.replace(tcfg, sampler_capacity_frac=0.9,
                                   fill_capacity_frac=0.9)
    return MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=FEAT, dims=(32,) * 2,
                                    skip_in=(), multires=4),
            render=RenderConfig(feature_vector_size=FEAT, dims=(32,),
                                multires_view=2),
            tracer=tcfg, shard_map_trace=shard_map_trace,
            use_pallas_trace=pallas, use_pallas_march=march,
            pallas_interpret=pallas, pallas_block=128,
            pallas_march_block=128),
        schedule=Schedule(),
        train=TrainConfig(batch_size=2, num_pixels=64, nepochs=12))


@pytest.mark.parametrize("march,compact", [(False, False), (False, True),
                                           (True, False)])
def test_shard_map_pallas_trace_equals_global_xla(march, compact):
    batch_np = make_scene(n_images=2, n_pix=64, feat_ch=FEAT, seed=7)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)
    w = weights_to_array(Schedule().weights(0.3))

    cfg_a = _cfg()  # single-device XLA trace, the reference result
    state0 = init_train_state(cfg_a, seed=0)
    step_a = make_train_step(cfg_a, 1, mesh=None, donate=False)
    sa, ma = step_a(state0, batch, w, key)

    mesh = make_mesh()
    cfg_b = _cfg(shard_map_trace=True, pallas=True, march=march,
                 compact=compact)
    step_b = make_train_step(cfg_b, 1, mesh=mesh, donate=False)
    sb, mb = step_b(state0, device_put_batch(mesh, batch), w, key)

    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(ma["hit_frac"]), float(mb["hit_frac"]),
                               atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(sa.params),
                    jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

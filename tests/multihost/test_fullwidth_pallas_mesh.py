"""VERDICT r4 missing #4: the PRODUCTION Pallas stack (width-512 net with
skip-layer padding in pallas/sdf_kernel, capacity cascades, supervised
compaction) exercised under a multi-device mesh. The fullsize dryrun legs
use the XLA trace path; the tiny interpret-mode legs use width 32 — this
test runs the full net width (where the kernel's skip-layer packing
actually bites) with reduced rays (8 images x 256 rays) on the 8-device
CPU mesh, and must match the single-device XLA-trace result.

Interpret-mode Pallas at width 512 is CPU-heavy; rays and march length are
the reduced axes, never the width. ~2-4 min."""
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

pytestmark = pytest.mark.slow

FEAT = 256  # production feature size; net width 512


def _cfg(shard_map_trace=False, pallas=False, compact=False):
    # production net (512x8, skip at 4, multires 6) — only rays/march are
    # reduced
    tcfg = TracerConfig(sphere_tracing_iters=5, n_steps=40,
                        n_secant_steps=8, sample_chunk=0)
    if compact:
        tcfg = dataclasses.replace(
            tcfg, fill_misses=False,
            fallback_capacity_frac=(0.25, 0.5),
            march_compact_schedule=((1, (0.5, 0.75)),))
    return MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=FEAT,
                                    dims=(512,) * 8, skip_in=(4,),
                                    multires=6),
            render=RenderConfig(feature_vector_size=FEAT,
                                dims=(512,) * 4, multires_view=4),
            tracer=tcfg, shard_map_trace=shard_map_trace,
            use_pallas_trace=pallas, pallas_interpret=pallas,
            pallas_block=128,
            supervised_compact_frac=(0.5,) if compact else ()),
        schedule=Schedule(),
        train=TrainConfig(batch_size=8, num_pixels=256, nepochs=12))


def test_fullwidth_pallas_mesh_equals_single_device_xla():
    batch_np = make_scene(n_images=8, n_pix=256, feat_ch=FEAT, seed=7)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)
    w = weights_to_array(Schedule().weights(0.3))

    cfg_a = _cfg()  # single-device XLA trace, dense: the reference result
    state0 = init_train_state(cfg_a, seed=0)
    step_a = make_train_step(cfg_a, 1, mesh=None, donate=False)
    sa, ma = step_a(state0, batch, w, key)

    mesh = make_mesh()
    cfg_b = _cfg(shard_map_trace=True, pallas=True, compact=True)
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

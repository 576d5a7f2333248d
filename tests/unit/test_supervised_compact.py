"""Supervised-path compaction (ModelConfig.supervised_compact_frac) must be
output-equivalent: the rt_surf sample group and the shading pass read only
surface-hit lanes, so gathering them into a fixed block before the live-
gradient MLP calls changes no loss value and no gradient beyond the
roundoff of re-tiled matmul reductions."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsdf_tpu.config import MVSDFConfig, ModelConfig, Schedule, TrainConfig
from mvsdf_tpu.fields.sdf import ImplicitConfig
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.rendering.renderer import render_forward
from mvsdf_tpu.supervision.losses import total_loss
from mvsdf_tpu.train.step import init_train_state
from tests.golden.scene_fixtures import make_scene

B, P = 2, 64


def _cfg(comp, remat=True):
    return MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=16, dims=(32,) * 3,
                                    skip_in=(2,), multires=4),
            render=RenderConfig(feature_vector_size=16, dims=(32,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=8, n_steps=16,
                                n_secant_steps=3, sample_chunk=0),
            supervised_compact_frac=comp, supervised_remat=remat),
        schedule=Schedule(),
        train=TrainConfig(batch_size=B, num_pixels=P))


def _run(comp, tp, batch, key, remat=True):
    cfg = _cfg(comp, remat=remat)
    state = init_train_state(cfg, seed=0)
    gates = cfg.schedule.gates(tp)
    w = cfg.schedule.weights(tp)

    def loss_fn(params):
        out = render_forward(cfg.model, params, batch, training=True,
                             gates=gates, key=key)
        lt = total_loss(out, batch, gates, cfg.schedule, w)
        return lt.loss, out

    (loss, out), g = jax.jit(jax.value_and_grad(loss_fn,
                                                has_aux=True))(state.params)
    flat = np.concatenate([np.asarray(l).ravel()
                           for l in jax.tree_util.tree_leaves(g)])
    return np.asarray(loss), flat, out


@pytest.mark.parametrize("tp", [pytest.param(0.10, marks=pytest.mark.slow),
                                0.30])
@pytest.mark.parametrize("comp", [pytest.param((0.75,), marks=pytest.mark.slow),
                                  (0.25, 0.75)])
def test_compact_matches_dense(tp, comp):
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in make_scene(
        n_images=B, n_pix=P, feat_ch=8, img_hw=32, depth_hw=16).items()}
    key = jax.random.PRNGKey(5)
    loss_d, g_d, out_d = _run((), tp, batch, key)
    loss_c, g_c, out_c = _run(comp, tp, batch, key)
    hit = np.asarray(out_d.network_object_mask)
    assert hit.any() and not hit.all()  # fixture exercises both lanes
    np.testing.assert_allclose(loss_c, loss_d, rtol=0, atol=1e-6)
    np.testing.assert_allclose(g_c, g_d, rtol=2e-4, atol=1e-6)
    # rgb at hit lanes identical values (same rows through the same MLP)
    np.testing.assert_allclose(np.asarray(out_c.rgb_values)[hit],
                               np.asarray(out_d.rgb_values)[hit],
                               rtol=2e-6, atol=1e-7)


def test_remat_matches_no_remat():
    """ModelConfig.supervised_remat (jax.checkpoint on the compaction tier
    fns — deletes the cond linearization's zero-filled untaken-branch
    residuals, PERF.md round 5) must leave loss and gradients equal up to
    the roundoff of re-fused reductions (measured 3e-6 rel on the
    full-size step; the recompute runs the same ops on the same values,
    only XLA fusion boundaries move)."""
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in make_scene(
        n_images=B, n_pix=P, feat_ch=8, img_hw=32, depth_hw=16).items()}
    key = jax.random.PRNGKey(5)
    loss_r, g_r, out_r = _run((0.25, 0.75), 0.30, batch, key, remat=True)
    loss_n, g_n, out_n = _run((0.25, 0.75), 0.30, batch, key, remat=False)
    np.testing.assert_allclose(loss_r, loss_n, rtol=1e-5, atol=0)
    np.testing.assert_allclose(g_r, g_n, rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_r.network_object_mask),
                                  np.asarray(out_n.network_object_mask))


def test_overflow_falls_back_dense():
    """A capacity below the hit count must take the dense branch and stay
    equivalent (cascade safety property)."""
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in make_scene(
        n_images=B, n_pix=P, feat_ch=8, img_hw=32, depth_hw=16).items()}
    key = jax.random.PRNGKey(5)
    loss_d, g_d, out_d = _run((), 0.30, batch, key)
    n_hit = int(np.asarray(out_d.network_object_mask).sum())
    assert n_hit > 1
    # _compact_call floors capacities at 128 rows; with B*P=128 a frac
    # below n_hit/(B*P) still builds cap=128 >= N and runs dense — which
    # is exactly the overflow semantics being asserted
    loss_c, g_c, _ = _run((max(1, n_hit - 1) / (B * P),), 0.30, batch, key)
    np.testing.assert_allclose(loss_c, loss_d, rtol=0, atol=1e-6)
    np.testing.assert_allclose(g_c, g_d, rtol=2e-4, atol=1e-6)

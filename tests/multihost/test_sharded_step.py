"""Sharded-vs-single-device equivalence of the training step on the 8-device
simulated CPU mesh (SURVEY.md section 4: multi-device tests without a pod)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvsdf_tpu.config import (MVSDFConfig, ModelConfig, Schedule, TrainConfig)
from mvsdf_tpu.fields.sdf import ImplicitConfig
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                  weights_to_array)
from mvsdf_tpu.parallel import make_mesh, device_put_batch

from tests.golden.scene_fixtures import make_scene

FEAT = 16


def tiny_cfg(batch_size=2, n_pix=64):
    return MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=FEAT, dims=(32,) * 2,
                                    skip_in=(), multires=4),
            render=RenderConfig(feature_vector_size=FEAT, dims=(32,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=5, n_steps=20,
                                n_secant_steps=4, sample_chunk=0)),
        schedule=Schedule(),
        train=TrainConfig(batch_size=batch_size, num_pixels=n_pix, nepochs=12))


def make_batch(n_images=2, n_pix=64):
    scene = make_scene(n_images=n_images, n_pix=n_pix, feat_ch=FEAT, seed=7)
    return {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}


@pytest.mark.parametrize("phase_idx", [1])
def test_sharded_equals_unsharded(phase_idx):
    cfg = tiny_cfg()
    batch = make_batch()
    key = jax.random.PRNGKey(0)
    w = weights_to_array(cfg.schedule.weights(0.3))

    state0 = init_train_state(cfg, seed=0)
    step_single = make_train_step(cfg, phase_idx, mesh=None, donate=False)
    state1, m1 = step_single(state0, batch, w, key)

    mesh = make_mesh()
    assert mesh.size == 8
    step_sharded = make_train_step(cfg, phase_idx, mesh=mesh, donate=False)
    sharded_batch = device_put_batch(mesh, batch)
    state2, m2 = step_sharded(state0, sharded_batch, w, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=2e-4, atol=1e-6)
    # updated params identical across the two paths
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_step_runs_all_phases():
    cfg = tiny_cfg()
    batch = make_batch()
    key = jax.random.PRNGKey(1)
    state = init_train_state(cfg, seed=0)
    for phase_idx, tp in [(0, 0.0), (1, 0.3), (2, 0.8)]:
        step = make_train_step(cfg, phase_idx, donate=False)
        w = weights_to_array(cfg.schedule.weights(tp))
        state, metrics = step(state, batch, w, key)
        assert np.isfinite(float(metrics["loss"])), (phase_idx, metrics)
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert np.isfinite(np.asarray(leaf)).all()


def test_lr_schedule_milestones():
    cfg = tiny_cfg()
    from mvsdf_tpu.train.step import make_optimizer
    _, lr_for_epoch = make_optimizer(cfg)
    base = cfg.train.learning_rate * cfg.train.batch_size
    # nepochs=12 -> milestones at 8 and 10
    assert abs(float(lr_for_epoch(jnp.asarray(0))) - base) < 1e-9
    assert abs(float(lr_for_epoch(jnp.asarray(8))) - base * 0.1) < 1e-9
    assert abs(float(lr_for_epoch(jnp.asarray(10))) - base * 0.01) < 1e-9

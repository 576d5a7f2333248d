"""Opt-in robustness guards: non-finite-update skipping and the
implicit-diff grazing-ray clamp. Defaults keep reference-exact behavior."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mvsdf_tpu.config import MVSDFConfig, ModelConfig, Schedule, TrainConfig
from mvsdf_tpu.fields.sdf import ImplicitConfig
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                  weights_to_array)
from mvsdf_tpu.rendering.implicit_diff import differentiable_surface_points

from tests.golden.scene_fixtures import make_scene

FEAT = 16


def _cfg(**train_kw):
    return MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=FEAT, dims=(32,) * 2,
                                    skip_in=(), multires=4),
            render=RenderConfig(feature_vector_size=FEAT, dims=(32,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=4, n_steps=16,
                                n_secant_steps=3, sample_chunk=0)),
        schedule=Schedule(),
        train=TrainConfig(batch_size=2, num_pixels=32, nepochs=12,
                          **train_kw))


def test_nonfinite_grad_skips_update():
    cfg = _cfg(skip_nonfinite_updates=True)
    scene = make_scene(n_images=2, n_pix=32, feat_ch=FEAT, seed=3)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    state = init_train_state(cfg, seed=0)
    # lane-masked losses shrug off poisoned *data*; a blown-up parameter
    # (what a phase-A gradient spike produces) is the real failure mode
    state = state._replace(params=jax.tree_util.tree_map(
        lambda x: x, state.params))
    state.params["implicit"][0]["v"] =         state.params["implicit"][0]["v"].at[0, 0].set(jnp.nan)
    p0 = jax.tree_util.tree_leaves(state.params)
    step = make_train_step(cfg, phase_idx=1, donate=False)
    w = weights_to_array(cfg.schedule.weights(0.3))
    state2, metrics = step(state, batch, w, jax.random.PRNGKey(0))
    # gradient norm is NaN but params stayed finite and unchanged
    assert not np.isfinite(float(metrics["grad_norm"]))
    for a, b in zip(p0, jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nonfinite_without_guard_poisons_params():
    cfg = _cfg(skip_nonfinite_updates=False)
    scene = make_scene(n_images=2, n_pix=32, feat_ch=FEAT, seed=3)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    state = init_train_state(cfg, seed=0)
    state.params["implicit"][0]["v"] =         state.params["implicit"][0]["v"].at[0, 0].set(jnp.nan)
    step = make_train_step(cfg, phase_idx=1, donate=False)
    w = weights_to_array(cfg.schedule.weights(0.3))
    state2, _ = step(state, batch, w, jax.random.PRNGKey(0))
    bad = any(not np.isfinite(np.asarray(l)).all()
              for l in jax.tree_util.tree_leaves(state2.params))
    assert bad  # documents why the guard exists


def test_min_dot_clamp_bounds_gradient():
    n = 4
    sdf_vals = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    grads = jnp.asarray([[1e-6, 0, 0], [1, 0, 0], [-1e-6, 0, 0],
                         [0.5, 0, 0]])
    dists = jnp.ones((n,))
    cam = jnp.zeros((n, 3))
    dirs = jnp.asarray([[1.0, 0, 0]] * n)
    mask = jnp.ones((n,), bool)

    def f(s, min_dot):
        pts = differentiable_surface_points(
            s, jax.lax.stop_gradient(s), grads, dists, cam, dirs,
            valid_mask=mask, min_dot=min_dot)
        return jnp.sum(pts)

    g_ref = jax.grad(lambda s: f(s, 0.0))(sdf_vals)
    g_clamped = jax.grad(lambda s: f(s, 1e-2))(sdf_vals)
    assert abs(float(g_ref[0])) > 1e5          # unbounded without clamp
    assert abs(float(g_clamped[0])) <= 100 + 1e-3
    # far-from-grazing lanes unchanged
    np.testing.assert_allclose(float(g_clamped[1]), float(g_ref[1]),
                               rtol=1e-6)

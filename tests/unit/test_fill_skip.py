"""Skipping the training-mode min-SDF miss fill must be output-equivalent.

The fill (ref ray_tracing.py:86-94, 280-308) writes points/dists only at
non-hit ray lanes, and every loss term multiplies those lanes by an
exactly-zero mask (see TracerConfig.fill_misses for the full proof), so
the train step's loss AND gradients must be BIT-IDENTICAL with the fill
on or off — while the (unconsumed) miss-lane points must differ, proving
the test is sensitive to the skip actually happening.
"""
import dataclasses

import jax
import numpy as np
import pytest

from mvsdf_tpu.config import (Gates, MVSDFConfig, ModelConfig, Schedule,
                              TrainConfig)
from mvsdf_tpu.fields.sdf import ImplicitConfig
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.rendering.renderer import render_forward
from mvsdf_tpu.train.step import (init_train_state, make_train_step,
                                  weights_to_array)
from tests.golden.scene_fixtures import make_scene

B, P = 2, 64


def _cfg(fill_misses, use_mask=False, fallback_frac=0.0, march_iters=4):
    return MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=16, dims=(32,) * 3,
                                    skip_in=(2,), multires=4),
            render=RenderConfig(feature_vector_size=16, dims=(32,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=march_iters, n_steps=16,
                                n_secant_steps=3, sample_chunk=0,
                                fallback_capacity_frac=fallback_frac,
                                fill_misses=fill_misses),
            use_mask=use_mask),
        schedule=Schedule(),
        train=TrainConfig(batch_size=B, num_pixels=P))


def _batch():
    sc = make_scene(n_images=B, n_pix=P, feat_ch=8, img_hw=32, depth_hw=16)
    return {k: jax.numpy.asarray(np.asarray(v)) for k, v in sc.items()}


def _leaves(tree):
    return np.concatenate([np.asarray(l).ravel()
                           for l in jax.tree_util.tree_leaves(tree)])


@pytest.mark.parametrize(
    "tp,use_mask",
    [pytest.param(0.10, False, marks=pytest.mark.slow),
     (0.30, False),
     # use_mask=True with a PARTIAL mask exercises the out_mask fill lanes
     # (~object_mask & ~sampler), the dominant fill set on masked scenes
     (0.30, True)])
def test_loss_and_gradients_bit_identical(tp, use_mask):
    """The exactness claim itself: loss AND every parameter-gradient leaf
    are bit-identical with the fill on or off."""
    from mvsdf_tpu.supervision.losses import total_loss

    batch = _batch()
    if use_mask:
        rng = np.random.default_rng(5)
        om = rng.uniform(size=(B, P)) < 0.5
        om[:, :4] = True  # keep a few in-mask lanes per image
        batch["object_mask"] = jax.numpy.asarray(om)
        # both fill branches must actually run on this fixture: out-of-mask
        # lanes exist by construction, in-mask non-hit lanes checked below
    key = jax.random.PRNGKey(7)
    results = {}
    for fill in (True, False):
        cfg = _cfg(fill_misses=fill, use_mask=use_mask)
        state = init_train_state(cfg, seed=0)
        gates = cfg.schedule.gates(tp)
        w = cfg.schedule.weights(tp)

        def loss_fn(params, cfg=cfg, gates=gates, w=w):
            out = render_forward(cfg.model, params, batch, training=True,
                                 gates=gates, key=key)
            return total_loss(out, batch, gates, cfg.schedule, w).loss

        loss, g = jax.jit(jax.value_and_grad(loss_fn))(state.params)
        results[fill] = (np.asarray(loss), _leaves(g))
    assert results[True][0] == results[False][0]
    np.testing.assert_array_equal(results[True][1], results[False][1])


@pytest.mark.parametrize("tp,fallback_frac", [
    pytest.param(0.10, 0.0, marks=pytest.mark.slow),
    (0.30, 0.0),
    pytest.param(0.30, 0.5, marks=pytest.mark.slow)])
def test_full_step_equivalent_with_and_without_fill(tp, fallback_frac):
    """Through the full jitted step (clip+Adam) the two variants are
    distinct XLA programs whose internal gradient-matmul tilings may
    differ, so params agree to roundoff rather than bitwise (the raw
    gradients ARE bitwise equal — test above); loss stays bit-exact."""
    batch = _batch()
    key = jax.random.PRNGKey(7)
    phase = 0 if tp < 1 / 6 else 1
    results = {}
    for fill in (True, False):
        cfg = _cfg(fill_misses=fill, fallback_frac=fallback_frac)
        state = init_train_state(cfg, seed=0)
        step = make_train_step(cfg, phase_idx=phase, donate=False)
        w = weights_to_array(cfg.schedule.weights(tp))
        new_state, metrics = step(state, batch, w, key)
        results[fill] = (np.asarray(metrics["loss"]),
                         _leaves(new_state.params))
    loss_on, params_on = results[True]
    loss_off, params_off = results[False]
    assert loss_on == loss_off  # bit-exact
    np.testing.assert_allclose(params_on, params_off, rtol=0, atol=1e-5)


@pytest.mark.slow
def test_miss_lane_points_differ_and_hits_identical():
    """Sensitivity: the skip must actually change the (unconsumed)
    miss-lane points, while hit lanes and the hit mask stay identical."""
    batch = _batch()
    key = jax.random.PRNGKey(3)
    outs = {}
    for fill in (True, False):
        # enough march iterations for miss rays' fronts to cross, so the
        # fill set (march-finished non-hits) is non-empty on this fixture
        cfg = _cfg(fill_misses=fill, march_iters=12)
        state = init_train_state(cfg, seed=0)
        out = render_forward(cfg.model, state.params,
                             {"uv": batch["uv"],
                              "intrinsics": batch["intrinsics"],
                              "pose": batch["pose"],
                              "object_mask": batch["object_mask"],
                              "depths": batch["depths"],
                              "depth_cams": batch["depth_cams"],
                              "center": batch["center"],
                              "size": batch["size"]},
                             training=True, gates=Gates(), key=key)
        outs[fill] = out
    on, off = outs[True], outs[False]
    np.testing.assert_array_equal(np.asarray(on.network_object_mask),
                                  np.asarray(off.network_object_mask))
    hit = np.asarray(on.network_object_mask)
    p_on = np.asarray(on.points)
    p_off = np.asarray(off.points)
    np.testing.assert_array_equal(p_on[hit], p_off[hit])
    miss = ~hit & np.asarray(on.object_mask) & np.asarray(
        jax.numpy.isfinite(on.dists))
    # at least some miss lanes must have moved (else the skip is a no-op
    # on this fixture and the equivalence test proves nothing)
    assert np.any(np.any(p_on != p_off, axis=-1) & miss)

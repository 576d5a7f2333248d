"""Compact-capacity fallback stages must be exactly equal to the dense
path — both when the active count fits the capacity (compact branch) and
when it overflows (dense branch)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mvsdf_tpu.tracing import TracerConfig, trace_rays


def torus(x):
    R, r = 0.5, 0.2
    q = jnp.stack([jnp.linalg.norm(x[..., :2], axis=-1) - R, x[..., 2]],
                  axis=-1)
    return jnp.linalg.norm(q, axis=-1) - r


def scene(n=256, seed=0, spread=1.2):
    rng = np.random.default_rng(seed)
    cam = np.tile(np.array([[0.2, -1.9, 1.0]], np.float32), (n, 1))
    targets = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    dirs = targets - cam
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(cam), jnp.asarray(dirs)


def run(cfg, training=True):
    org, dirs = scene()
    om = jnp.ones((256,), bool)
    steps = jnp.asarray(np.random.default_rng(7).uniform(size=cfg.n_steps),
                        jnp.float32)
    return trace_rays(cfg, torus, org, dirs, om, training=training,
                      minimal_steps=steps)


def _assert_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a.network_object_mask),
                                  np.asarray(b.network_object_mask))
    np.testing.assert_allclose(np.asarray(a.dists), np.asarray(b.dists),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.points), np.asarray(b.points),
                               atol=1e-6)


def test_compact_equals_dense_when_fits():
    dense = run(TracerConfig())
    compact = run(dataclasses.replace(TracerConfig(),
                                      sampler_capacity_frac=0.9,
                                      fill_capacity_frac=0.9))
    _assert_equal(dense, compact)


def test_dense_fallback_when_overflow():
    # capacity floor is 128 (half the rays); the torus scene misses most
    # rays -> fill overflows -> dense branch must engage and stay exact
    dense = run(TracerConfig())
    tiny = run(dataclasses.replace(TracerConfig(),
                                   sampler_capacity_frac=0.001,
                                   fill_capacity_frac=0.001))
    _assert_equal(dense, tiny)


def test_unified_fallback_equals_separate_stages():
    dense = run(TracerConfig())
    unified = run(dataclasses.replace(TracerConfig(),
                                      fallback_capacity_frac=0.9))
    _assert_equal(dense, unified)


def test_unified_fallback_full_capacity_fast_path():
    # capacity_frac=1.0 takes the no-gather dense fast path; must still be
    # exactly the separate-stages result
    dense = run(TracerConfig())
    full = run(dataclasses.replace(TracerConfig(),
                                   fallback_capacity_frac=1.0))
    _assert_equal(dense, full)


def test_auto_fallback_capacity():
    from mvsdf_tpu.tracing.sphere_trace import auto_fallback_capacity
    # all-ones masks (no background): margin only
    assert auto_fallback_capacity(1.0) == 0.3125
    # DTU-like 40% object coverage: out-of-mask 0.6 + margin -> dense
    assert auto_fallback_capacity(0.4) == 1.0
    # round-2 capstone scene stats: active was 0.836 vs old cap 0.5
    assert auto_fallback_capacity(0.378) == 1.0
    # monotone in background fraction, never exceeds 1
    caps = [auto_fallback_capacity(f) for f in (1.0, 0.8, 0.6, 0.4, 0.2)]
    assert caps == sorted(caps) and max(caps) <= 1.0


def test_fallback_capacity_cascade():
    dense = run(TracerConfig())
    # tiers around the active count: tightest fitting tier must run, exact
    casc = run(dataclasses.replace(TracerConfig(),
                                   fallback_capacity_frac=(0.6, 0.9)))
    _assert_equal(dense, casc)
    # all tiers overflow -> dense branch
    tiny = run(dataclasses.replace(TracerConfig(),
                                   fallback_capacity_frac=(0.001, 0.002)))
    _assert_equal(dense, tiny)
    # tier >= 1.0 is dropped; mixed cascade still exact
    mixed = run(dataclasses.replace(TracerConfig(),
                                    fallback_capacity_frac=(0.7, 1.0)))
    _assert_equal(dense, mixed)


def test_auto_fallback_cascade_and_intersect_bound():
    from mvsdf_tpu.tracing.sphere_trace import (auto_fallback_capacity,
                                                auto_fallback_cascade)
    # intersect bound tightens the all-ones-mask capacity (bench fixture:
    # 0.332 intersect, active 0.314 -> needs > 0.3125)
    assert auto_fallback_capacity(1.0) == 0.3125
    cap = auto_fallback_capacity(1.0, intersect_frac=0.332)
    assert 0.332 < cap <= 0.5
    # masked DTU-like scene: mask bound (dense) stays when intersect high
    assert auto_fallback_capacity(0.4, intersect_frac=0.95) == 1.0
    # cascade tiers ascend and top the single capacity
    casc = auto_fallback_cascade(1.0, intersect_frac=0.332)
    assert casc == tuple(sorted(casc)) and casc[-1] == cap
    assert auto_fallback_cascade(0.4) == (1.0,)


def test_ray_intersect_fraction():
    from mvsdf_tpu.tracing.sphere_trace import ray_intersect_fraction
    from tests.golden.scene_fixtures import make_scene
    sc = make_scene(n_images=2, n_pix=64, feat_ch=8, img_hw=32, depth_hw=16)
    frac = ray_intersect_fraction(sc["uv"], sc["intrinsics"], sc["pose"])
    assert 0.0 < frac <= 1.0
    # matches the tracer's own mask_intersect on the same rays
    org, dirs = scene()
    d_dot_o = np.sum(np.asarray(dirs) * np.asarray(org), -1)
    under = d_dot_o ** 2 - (np.sum(np.asarray(org) ** 2, -1) - 1.0)
    t = trace_rays(TracerConfig(), torus, org, dirs,
                   jnp.ones((256,), bool), training=False)
    np.testing.assert_array_equal(np.asarray(t.mask_intersect), under > 0)


def test_auto_march_schedule():
    from mvsdf_tpu.tracing.sphere_trace import auto_march_schedule
    # full-mask bench fixture: only the convergence margin remains;
    # every entry is a per-segment capacity cascade (ascending tiers)
    sched = auto_march_schedule(1.0)
    assert sched
    for _, tiers in sched:
        assert tiers == tuple(sorted(tiers))
        assert all(0 < f < 0.95 for f in tiers)
    starts = [s for s, _ in sched]
    assert starts == sorted(starts) and len(set(starts)) == len(starts)
    # masked scenes: the top (overflow) tier must cover the measured
    # active fractions from the trained capstone checkpoint, bg 0.768
    # (0.73 after iter 1, 0.61 after 4, 0.47 after 7 —
    # scripts/march_decay.py); scaled to this scene's bg they stay below
    # the bg+margin overflow bound by construction
    top = {s: max(t) for s, t in auto_march_schedule(0.232)}
    assert top[1] >= 0.73 and top[5] >= 0.61 and top[8] >= 0.47
    # tight tiers never increase along the march and never exceed 1
    for frac in (1.0, 0.7, 0.38, 0.1):
        caps = [min(t) for _, t in auto_march_schedule(frac)]
        assert caps == sorted(caps, reverse=True) and max(caps, default=0) <= 1
    # mostly-background scene: early compaction is pointless, schedule
    # drops segments whose cap is ~dense
    assert all(max(t) < 0.95 for _, t in auto_march_schedule(0.05))
    # intersect bound enables an iteration-0 segment on wide-FoV scenes
    # and caps every tier
    sched = auto_march_schedule(1.0, intersect_frac=0.33)
    assert sched[0][0] == 0
    assert all(f <= 0.5 for _, t in sched for f in t)
    # high-intersect masked scene: no iter-0 segment, mask bound rules
    sched = auto_march_schedule(0.38, intersect_frac=0.95)
    assert all(s >= 1 for s, _ in sched)
    # every generated schedule is accepted by the tracer and stays exact
    dense = run(TracerConfig())
    for frac in (1.0, 0.38):
        seg = run(dataclasses.replace(
            TracerConfig(), march_compact_schedule=auto_march_schedule(frac)))
        _assert_equal(dense, seg)


def test_unified_fallback_dense_branch_on_overflow():
    dense = run(TracerConfig())
    tiny = run(dataclasses.replace(TracerConfig(),
                                   fallback_capacity_frac=0.001))
    _assert_equal(dense, tiny)


def test_march_compact_equals_dense():
    dense = run(TracerConfig())
    seg = run(dataclasses.replace(
        TracerConfig(), march_compact_schedule=((0, 0.9), (2, 0.75))))
    _assert_equal(dense, seg)


def test_march_compact_dense_prefix_segment():
    # first compaction point mid-march: iterations [0, 3) run dense
    dense = run(TracerConfig())
    seg = run(dataclasses.replace(TracerConfig(),
                                  march_compact_schedule=((3, 0.75),)))
    _assert_equal(dense, seg)


def test_march_compact_overflow_dense_branch():
    # tiny capacity (floor 128 of 256 rays): overflow -> dense branch
    dense = run(TracerConfig())
    tiny = run(dataclasses.replace(TracerConfig(),
                                   march_compact_schedule=((0, 0.001),)))
    _assert_equal(dense, tiny)


def test_march_compact_eval_mode_and_2d_lead():
    # (B, P) lead shape exercises the flatten/reshape path
    org, dirs = scene()
    om = jnp.ones((256,), bool)
    steps = jnp.asarray(
        np.random.default_rng(7).uniform(size=TracerConfig().n_steps),
        jnp.float32)

    def run2d(cfg):
        return trace_rays(cfg, torus, org.reshape(4, 64, 3),
                          dirs.reshape(4, 64, 3), om.reshape(4, 64),
                          training=True, minimal_steps=steps)

    dense = run2d(TracerConfig())
    seg = run2d(dataclasses.replace(TracerConfig(),
                                    march_compact_schedule=((1, 0.6),)))
    _assert_equal(dense, seg)


def test_march_compact_cascade_tiers():
    dense = run(TracerConfig())
    # per-segment cascades: tight tier fits / overflows to next / dense
    for sched in (((0, (0.6, 0.9)), (2, (0.5, 0.75))),
                  ((0, (0.001, 0.002)),),        # all tiers overflow
                  ((1, (0.5, 1.0)),)):           # >=1.0 tier dropped
        seg = run(dataclasses.replace(TracerConfig(),
                                      march_compact_schedule=sched))
        _assert_equal(dense, seg)


def test_march_compact_schedule_validation():
    import pytest
    with pytest.raises(ValueError, match="strictly increasing"):
        run(dataclasses.replace(TracerConfig(),
                                march_compact_schedule=((3, 0.5), (1, 0.5))))


def test_compact_eval_mode():
    dense = run(TracerConfig(), training=False)
    compact = run(dataclasses.replace(TracerConfig(),
                                      sampler_capacity_frac=0.9),
                  training=False)
    _assert_equal(dense, compact)


def test_sampler_and_fill_cascades():
    # tuple capacities on the separate sampler/fill stages (the eval CLI
    # render path uses a sampler cascade), training and eval modes
    dense_t = run(TracerConfig())
    casc_t = run(dataclasses.replace(TracerConfig(),
                                     sampler_capacity_frac=(0.5, 0.9),
                                     fill_capacity_frac=(0.6, 0.9)))
    _assert_equal(dense_t, casc_t)
    dense_e = run(TracerConfig(), training=False)
    for fracs in ((0.5, 0.9), (0.001, 0.002), (0.7, 1.0)):
        casc_e = run(dataclasses.replace(TracerConfig(),
                                         sampler_capacity_frac=fracs),
                     training=False)
        _assert_equal(dense_e, casc_e)


def test_auto_supervised_cascade_single_bound_tier():
    """Round-5 measured policy: the single hard-bound tier (a hit requires
    a sphere crossing, so the intersect-bound tier can never overflow)
    beats any (sub-bound, bound) cascade wherever measured — bench fixture
    -2.3 ms/step, win-regime scene +3.4% (PERF.md r5)."""
    from mvsdf_tpu.tracing.sphere_trace import auto_supervised_cascade
    # engages below 0.5 with exactly one tier = the rounded bound
    assert auto_supervised_cascade(intersect_frac=0.332) == (0.375,)
    assert auto_supervised_cascade(intersect_frac=0.347) == (0.375,)
    # tiny scenes floor at 2*granularity
    assert auto_supervised_cascade(intersect_frac=0.01) == (0.125,)
    # >= 0.5 bound: dense (gathering most rows costs more than it saves)
    assert auto_supervised_cascade(intersect_frac=0.7) == ()
    assert auto_supervised_cascade(intersect_frac=None) == ()

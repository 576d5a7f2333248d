"""Benchmark: training-step throughput (rays/s/chip, forward+backward) of the
full-size MVSDF model on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
driver's north star is >=5x V100 rays/s/chip. V100_RAYS_S below is a
documented estimate of the PyTorch reference on V100: batch 8 x 4096 rays
per optimizer step at ~0.3 steps/s (IDR-class pipelines train 1800 epochs x
~6 steps in ~10-12 h on one V100) -> ~1e4 rays/s. vs_baseline is
measured / V100_RAYS_S.
"""
import json
import sys
import time

import numpy as np

V100_RAYS_S = 1.0e4

# full-size model, reference training shape: batch 8 images x 4096 rays
N_IMAGES = 8
N_PIX = 4096
FEAT_CH = 32
# Warmup covers compile + the early-training capacity-tier transient: the
# trace's active sets start high (sampler-active 0.055 -> dip -> settle
# 0.06-0.076, hit 0.30-0.32 by ~step 15, scripts/active_trajectory.py), so
# the first ~15 steps run larger compaction tiers than the steady state
# that >99% of a real 1800-epoch training occupies. Measuring the MEDIAN
# of several windows after the transient matches the window-median
# protocol of every PERF.md A/B and damps single-window tunnel noise
# (~10% observed).
WARMUP = 20
WINDOWS = 3
WINDOW_ITERS = 10


def _progress(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp
    from mvsdf_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # one shared cache with the CLIs/scripts
    # DEFAULT = single-pass bf16 multiplies with f32 accumulation: the
    # 600-epoch quality study (PERF.md) shows chamfer/PSNR equal-or-better
    # than tensorfloat32, at +9% step throughput. Override via
    # MVSDF_BENCH_PRECISION=tensorfloat32|highest.
    jax.config.update("jax_default_matmul_precision",
                      os.environ.get("MVSDF_BENCH_PRECISION", "default"))

    # The first compile in a process pays a large fixed backend-init cost on
    # the tunneled TPU; absorb it on a trivial program.
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    _progress(f"backend init: {time.perf_counter() - t0:.1f}s")

    sys.path.insert(0, ".")
    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    from tests.golden.scene_fixtures import make_scene

    cfg = MVSDFConfig(train=TrainConfig(batch_size=N_IMAGES,
                                        num_pixels=N_PIX))
    import dataclasses
    if os.environ.get("MVSDF_BENCH_PALLAS", "1") == "1":
        # fused VMEM-resident SDF kernel for the no-grad trace phase
        march = os.environ.get("MVSDF_BENCH_MARCH", "0") == "1"
        inkpe = os.environ.get("MVSDF_BENCH_INKPE", "0") == "1"
        secant = os.environ.get("MVSDF_BENCH_SECANT", "0") == "1"
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, use_pallas_trace=True, use_pallas_march=march,
            pallas_in_kernel_pe=inkpe, use_pallas_secant=secant))
        _progress(f"pallas trace kernel: on (fused march: {march}, "
                  f"in-kernel PE: {inkpe}, fused secant: {secant})")
    if os.environ.get("MVSDF_BENCH_FILLSKIP", "1") == "1":
        # skip the training-mode min-SDF miss fill — its outputs are dead
        # in the training step (TracerConfig.fill_misses: losses+grads
        # bit-identical, tested); mirrors the train CLI default
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, tracer=dataclasses.replace(
                cfg.model.tracer, fill_misses=False)))
        _progress("miss fill: skipped (dead compute in the train step)")
    if os.environ.get("MVSDF_BENCH_COMPACT", "1") == "1":
        # fallback-stage compaction cascade (exact; next tier / dense on
        # overflow). Fixture active set: 33.2% of rays intersect the
        # bounding sphere (the hard geometric bound on the fallback),
        # measured active 0.314 at init (sampler+fill) -> top tier 0.375;
        # with the fill skipped only the march-unfinished sampler rays
        # remain (steady state 0.06-0.076, scripts/active_trajectory.py).
        # Middle tier 0.09375 (not 0.1875): RESIZING the tier won -6%
        # wall at steady state where ADDING tiers lost (branch plumbing)
        # — scripts/donate_tier_ab.py, PERF.md round 4.
        tr = dataclasses.replace(cfg.model.tracer,
                                 sampler_capacity_frac=0.25,
                                 fill_capacity_frac=0.5,
                                 fallback_capacity_frac=(0.0625, 0.09375,
                                                         0.375))
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, tracer=tr))
        _progress("fallback compaction: on")
    if os.environ.get("MVSDF_BENCH_MARCH_COMPACT", "1") == "1":
        # mid-march compaction cascades (exact; next tier / dense on
        # overflow). Measured on this fixture: 33% of rays intersect the
        # bounding sphere, 14% still march after one iteration, <10% past
        # iter 5 (scripts/march_decay.py); borderline early-training
        # counts overflow the tight tiers, which now costs one tier up
        # instead of a full-R dense segment.
        tr = dataclasses.replace(cfg.model.tracer,
                                 march_compact_schedule=(
                                     (0, (0.375, 0.5)),
                                     (1, (0.1875, 0.25)),
                                     (5, (0.0625, 0.125, 0.25))))
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, tracer=tr))
        _progress("march compaction: on")
    if os.environ.get("MVSDF_BENCH_FUSEDGRAD", "0") == "1":
        # hand-derived custom VJP for the supervised value+spatial-gradient
        # path (fields/fused_grad.py); measured 5% slower than XLA autodiff
        # on v5e (PERF.md round 3), so off by default — env for A/B timing
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, implicit=dataclasses.replace(
                cfg.model.implicit, fused_value_grad=True)))
        _progress("fused value+grad VJP: on")
    if os.environ.get("MVSDF_BENCH_SUPCOMPACT", "1") == "1":
        # supervised-path compaction: rt_surf group + shading run only on
        # surface-hit lanes (exact; dense on overflow). Fixture hit set is
        # bounded by the 0.332 sphere-intersect fraction. SINGLE 0.375
        # tier: steady hit is 0.30-0.32, so the old 0.25 bottom tier never
        # fit — dropping it won -2.3 ms/step device busy in the round-5
        # A/B (scripts/scatter_into_ab.py, PERF.md).
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, supervised_compact_frac=(0.375,)))
        _progress("supervised compaction: on")
    if os.environ.get("MVSDF_BENCH_BF16ACT", "1") == "1":
        # bf16 activation storage in the supervised MLP (same bf16
        # multiply / f32 accumulate as DEFAULT matmul precision; halves
        # the HBM bytes of the bandwidth-bound supervised fwd+bwd)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, implicit=dataclasses.replace(
                cfg.model.implicit, bf16_activations=True)))
        _progress("bf16 activations: on")
    scene = make_scene(n_images=N_IMAGES, n_pix=N_PIX, feat_ch=FEAT_CH,
                      img_hw=96, depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    state = init_train_state(cfg, seed=0)
    # donate=True matches the production fused train loop (train/loop.py)
    # and measured -0.9 ms device busy (scripts/slice_scatter_ab.py r5)
    step = make_train_step(cfg, phase_idx=1, donate=True)
    w = weights_to_array(cfg.schedule.weights(0.3))
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    for _ in range(WARMUP):
        state, metrics = step(state, batch, w, key)
    jax.block_until_ready(metrics["loss"])
    _progress(f"step compile+warmup: {time.perf_counter() - t0:.1f}s")

    window_dt = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(WINDOW_ITERS):
            state, metrics = step(state, batch, w, key)
        jax.block_until_ready(metrics["loss"])
        window_dt.append((time.perf_counter() - t0) / WINDOW_ITERS)
    dt = float(np.median(window_dt))
    _progress(f"window ms: {[round(d * 1e3, 1) for d in window_dt]}")

    rays_per_step = N_IMAGES * N_PIX
    rays_s = rays_per_step / dt
    print(json.dumps({
        "metric": "train_rays_per_s_per_chip",
        "value": round(rays_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_s / V100_RAYS_S, 3),
    }))


if __name__ == "__main__":
    main()

"""Round-4 throughput A/B, all in ONE TPU process (degraded-tunnel mode
pays ~5 min per process on the first device->host fetch).

Arms:
  1. trace-only: sampler/fallback sample-axis chunking (lax.map, 5
     dependent launches) vs one whole (rays, n_steps) Pallas launch
  2. full train step at the bench configuration (the bench number)

Timing per PERF.md methodology: chained iterations + trailing host fetch.
Run solo:  timeout 1800 python scripts/step_ab_r4.py
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from mvsdf_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_default_matmul_precision", "default")

    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    print(f"backend init: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    float(jnp.ones(4).sum())
    print(f"first fetch: {time.perf_counter() - t0:.1f}s", flush=True)

    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.fields.sdf import ImplicitConfig
    from mvsdf_tpu.tracing.sphere_trace import TracerConfig, trace_rays
    from mvsdf_tpu.tracing.pallas import pack_sdf_weights, pallas_sdf_apply
    from mvsdf_tpu.geometry.cameras import get_camera_params
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    from tests.golden.scene_fixtures import make_scene

    N_IMAGES, N_PIX, FEAT_CH = 8, 4096, 32
    scene = make_scene(n_images=N_IMAGES, n_pix=N_PIX, feat_ch=FEAT_CH,
                       img_hw=96, depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    base_tracer = TracerConfig(
        fill_misses=False,
        sampler_capacity_frac=0.25, fill_capacity_frac=0.5,
        fallback_capacity_frac=(0.0625, 0.1875, 0.375),
        march_compact_schedule=((0, (0.375, 0.5)), (1, (0.1875, 0.25)),
                                (5, (0.0625, 0.125, 0.25))))

    cfg = MVSDFConfig(train=TrainConfig(batch_size=N_IMAGES,
                                        num_pixels=N_PIX))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, use_pallas_trace=True, tracer=base_tracer,
        supervised_compact_frac=(0.25, 0.375),
        implicit=dataclasses.replace(cfg.model.implicit,
                                     bf16_activations=True)))

    state = init_train_state(cfg, seed=0)
    icfg = cfg.model.implicit
    packed = pack_sdf_weights(icfg, state.params["implicit"])
    sdf_fn = lambda x: pallas_sdf_apply(icfg, packed, x)

    ray_dirs, cam_loc = get_camera_params(batch["uv"], batch["pose"],
                                          batch["intrinsics"])
    org = jnp.broadcast_to(cam_loc[:, None, :], ray_dirs.shape)
    om = jnp.ones(ray_dirs.shape[:-1], bool)
    msteps = jax.random.uniform(jax.random.PRNGKey(0), (100,))

    def time_trace(tcfg, label, iters=30):
        f = jax.jit(lambda o: trace_rays(tcfg, sdf_fn, o, ray_dirs, om,
                                         training=True,
                                         minimal_steps=msteps))
        tr = f(org)
        float(np.asarray(tr.dists).sum())  # compile + warm fetch
        t0 = time.perf_counter()
        o = org
        for _ in range(iters):
            tr = f(o)
            o = org + 0.0 * tr.dists[..., None]  # chain dependency
        s = float(np.asarray(tr.dists).sum())
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"trace[{label}]: {dt:.2f} ms  (checksum {s:.4f})",
              flush=True)
        return dt, s

    dt_chunk, s1 = time_trace(
        dataclasses.replace(base_tracer, sample_chunk=20), "chunk=20")
    dt_nochunk, s2 = time_trace(
        dataclasses.replace(base_tracer, sample_chunk=0), "chunk=0")
    assert s1 == s2, f"chunking changed the trace result: {s1} vs {s2}"
    print(f"sample-chunk removal: {dt_chunk:.2f} -> {dt_nochunk:.2f} ms "
          f"({(dt_chunk - dt_nochunk) / dt_chunk:+.1%})", flush=True)

    # --- full train step (bench configuration, new renderer default) ------
    step = make_train_step(cfg, phase_idx=1, donate=False)
    w = weights_to_array(cfg.schedule.weights(0.3))
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    st = state
    for _ in range(3):
        st, metrics = step(st, batch, w, key)
    float(np.asarray(metrics["loss"]))
    print(f"step compile+warmup: {time.perf_counter() - t0:.1f}s",
          flush=True)
    ITERS = 15
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st, metrics = step(st, batch, w, key)
    float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / ITERS
    rays_s = N_IMAGES * N_PIX / dt
    print(json.dumps({"metric": "train_rays_per_s_per_chip",
                      "value": round(rays_s, 1),
                      "step_ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()

"""Capacity-tier A/B on the real chip (ONE process): the active-trajectory
data (scripts/active_trajectory.py) shows the bench fixture settles at
sampler_active 0.06-0.076 (just above the 0.0625 tier -> the fallback runs
its 0.1875 tier, the step's single largest op at 13.5 ms) and hit 0.30-0.32
(just under the 0.375 supervised tier). Finer tiers should cut both.
Loss parity is asserted per-arm (the cascades are exact by construction).
"""
import dataclasses
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
    jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    float(jnp.ones(4).sum())

    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    from tests.golden.scene_fixtures import make_scene

    scene = make_scene(n_images=8, n_pix=4096, feat_ch=32, img_hw=96,
                       depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    def build(fallback, march, super_):
        cfg = MVSDFConfig(train=TrainConfig(batch_size=8, num_pixels=4096))
        tr = dataclasses.replace(
            cfg.model.tracer, fill_misses=False,
            sampler_capacity_frac=0.25, fill_capacity_frac=0.5,
            fallback_capacity_frac=fallback, march_compact_schedule=march)
        return dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, use_pallas_trace=True, tracer=tr,
            supervised_compact_frac=super_,
            implicit=dataclasses.replace(cfg.model.implicit,
                                         bf16_activations=True)))

    arms = {
        "r3-tiers": build(
            (0.0625, 0.1875, 0.375),
            ((0, (0.375, 0.5)), (1, (0.1875, 0.25)),
             (5, (0.0625, 0.125, 0.25))),
            (0.25, 0.375)),
        "fine-tiers": build(
            (0.0625, 0.09375, 0.125, 0.1875, 0.375),
            ((0, (0.375, 0.5)), (1, (0.15625, 0.1875, 0.25)),
             (5, (0.0625, 0.09375, 0.125, 0.25))),
            (0.25, 0.3125, 0.375)),
    }

    results = {}
    for name, cfg in arms.items():
        state = init_train_state(cfg, seed=0)
        step = make_train_step(cfg, phase_idx=1, donate=False)
        w = weights_to_array(cfg.schedule.weights(0.3))
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        st = state
        for _ in range(3):
            st, m = step(st, batch, w, key)
        float(np.asarray(m["loss"]))
        print(f"[{name}] compile+warmup {time.perf_counter()-t0:.1f}s",
              flush=True)
        # bench protocol: steps 4-13
        t0 = time.perf_counter()
        for _ in range(10):
            st, m = step(st, batch, w, key)
        l13 = float(np.asarray(m["loss"]))
        dt_bench = (time.perf_counter() - t0) / 10
        # steady state: steps 14-23 skipped, 24-43 timed
        for _ in range(10):
            st, m = step(st, batch, w, key)
        float(np.asarray(m["loss"]))
        t0 = time.perf_counter()
        for _ in range(20):
            st, m = step(st, batch, w, key)
        l43 = float(np.asarray(m["loss"]))
        dt_steady = (time.perf_counter() - t0) / 20
        results[name] = (dt_bench, dt_steady, l13, l43)
        print(f"[{name}] bench(4-13): {dt_bench*1e3:.2f} ms "
              f"({8*4096/dt_bench:,.0f} rays/s)  "
              f"steady(24-43): {dt_steady*1e3:.2f} ms "
              f"({8*4096/dt_steady:,.0f} rays/s)  "
              f"loss13={l13:.6f} loss43={l43:.6f}", flush=True)

    a, b = results["r3-tiers"], results["fine-tiers"]
    print(f"loss parity: d13={abs(a[2]-b[2]):.2e} d43={abs(a[3]-b[3]):.2e}")
    print(f"bench gain: {(a[0]-b[0])/a[0]:+.1%}  "
          f"steady gain: {(a[1]-b[1])/a[1]:+.1%}")


if __name__ == "__main__":
    main()

"""Round-5 A/B: scatter only the consumed (SDF, logit) columns at the
supervised rt_surf compaction site vs the full (2+256)-column scatter.
The op profile attributes ~1.9 ms/step of broadcast/copy mass to each
supervised tier branch's full-width (N, 258) materializations; only
columns 0-1 are consumed at full ray size (features are recomputed in the
shading compaction). Also re-times donation on the winner.

Protocol: alternating 10-step windows at steady state; one-step loss
bit-equality (slicing unconsumed columns cannot change math).
Run solo:  timeout 3600 python scripts/slice_scatter_ab.py
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    from mvsdf_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_default_matmul_precision", "default")
    jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    float(jnp.ones(4).sum())
    print("backend up", flush=True)

    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.rendering import renderer as renderer_mod
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    from tests.golden.scene_fixtures import make_scene

    scene = make_scene(n_images=8, n_pix=4096, feat_ch=32, img_hw=96,
                       depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    cfg = MVSDFConfig(train=TrainConfig(batch_size=8, num_pixels=4096))
    tr = dataclasses.replace(
        cfg.model.tracer, fill_misses=False,
        sampler_capacity_frac=0.25, fill_capacity_frac=0.5,
        fallback_capacity_frac=(0.0625, 0.09375, 0.375),
        march_compact_schedule=((0, (0.375, 0.5)), (1, (0.1875, 0.25)),
                                (5, (0.0625, 0.125, 0.25))))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, use_pallas_trace=True, tracer=tr,
        supervised_compact_frac=(0.375,),
        implicit=dataclasses.replace(cfg.model.implicit,
                                     bf16_activations=True)))

    key = jax.random.PRNGKey(0)
    w = weights_to_array(cfg.schedule.weights(0.3))
    arms = {"full258": None, "slice2": 2, "slice2_donate": 2}
    steps, states, eq = {}, {}, {}
    for name, cols in arms.items():
        renderer_mod._RT_SURF_SCATTER_COLS = cols
        st = init_train_state(cfg, seed=0)
        fn = make_train_step(cfg, phase_idx=1,
                             donate=name.endswith("donate"))
        t0 = time.perf_counter()
        st, m = fn(st, batch, w, key)
        eq[name] = float(np.asarray(m["loss"]))
        for _ in range(22):
            st, m = fn(st, batch, w, key)
        float(np.asarray(m["loss"]))
        print(f"[{name}] compile+advance {time.perf_counter()-t0:.1f}s "
              f"loss={eq[name]!r}", flush=True)
        steps[name], states[name] = fn, st
    renderer_mod._RT_SURF_SCATTER_COLS = 2
    assert len(set(eq.values())) == 1, f"arms diverge: {eq}"
    print("one-step bit-equality: OK", flush=True)

    wins = {n: [] for n in arms}
    for rep in range(6):
        for name in arms:
            st = states[name]
            t0 = time.perf_counter()
            for _ in range(10):
                st, m = steps[name](st, batch, w, key)
            float(np.asarray(m["loss"]))
            wins[name].append((time.perf_counter() - t0) / 10 * 1e3)
            states[name] = st
    out = {}
    for name in arms:
        v = np.array(wins[name])
        out[name] = float(np.median(v))
        print(f"[{name}] windows ms: {np.round(v, 1).tolist()} "
              f"median {np.median(v):.2f}", flush=True)
    print(json.dumps({f"{n}_ms": round(out[n], 2) for n in arms}),
          flush=True)

    from tier_ab2 import device_busy_ms
    for name in arms:
        logdir = f"/tmp/mvsdf_ss_{name}"
        os.system(f"rm -rf {logdir}")
        st = states[name]
        with jax.profiler.trace(logdir):
            for _ in range(5):
                st, m = steps[name](st, batch, w, key)
            float(np.asarray(m["loss"]))
        states[name] = st
        try:
            print(f"[{name}] device busy: "
                  f"{device_busy_ms(logdir, 5):.2f} ms/step", flush=True)
        except Exception as e:
            print(f"[{name}] profile parse failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()

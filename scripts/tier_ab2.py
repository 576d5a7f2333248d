"""Tier A/B, low-variance protocol: ALTERNATING 10-step windows per arm
(tunnel wall-time drift hits both arms equally) + device-busy time from a
profiler capture per arm. One process.
"""
import dataclasses
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def device_busy_ms(logdir, steps):
    from xprof.convert import raw_to_tool_data
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "op_profile", {})
    tree = json.loads(data)
    prog = tree["byProgram"]
    # sum rawTime over the program's immediate children minus IDLE
    total = 0
    for child in prog.get("children", []):
        if child.get("name") == "IDLE":
            continue
        total += child["metrics"]["rawTime"]
    return total / steps / 1e9


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
        "r3": build((0.0625, 0.1875, 0.375),
                    ((0, (0.375, 0.5)), (1, (0.1875, 0.25)),
                     (5, (0.0625, 0.125, 0.25))),
                    (0.25, 0.375)),
        "fine": build((0.0625, 0.09375, 0.125, 0.1875, 0.375),
                      ((0, (0.375, 0.5)), (1, (0.15625, 0.1875, 0.25)),
                       (5, (0.0625, 0.09375, 0.125, 0.25))),
                      (0.25, 0.3125, 0.375)),
    }

    steps = {}
    states = {}
    key = jax.random.PRNGKey(0)
    w = None
    for name, cfg in arms.items():
        st = init_train_state(cfg, seed=0)
        fn = make_train_step(cfg, phase_idx=1, donate=False)
        w = weights_to_array(cfg.schedule.weights(0.3))
        t0 = time.perf_counter()
        for _ in range(3):
            st, m = fn(st, batch, w, key)
        float(np.asarray(m["loss"]))
        print(f"[{name}] compile {time.perf_counter()-t0:.1f}s", flush=True)
        steps[name] = fn
        states[name] = st

    # advance both to steady state (20 more steps)
    for name in arms:
        st = states[name]
        for _ in range(20):
            st, m = steps[name](st, batch, w, key)
        float(np.asarray(m["loss"]))
        states[name] = st

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
    for name in arms:
        v = np.array(wins[name])
        print(f"[{name}] windows ms: {np.round(v, 1).tolist()} "
              f"median {np.median(v):.2f}", flush=True)

    # device-busy via profiler (5 steps each)
    for name in arms:
        logdir = f"/tmp/mvsdf_tier_{name}"
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

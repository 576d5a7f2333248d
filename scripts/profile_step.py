"""Op-level profile of the bench train step on the real chip (ONE process).

Captures a jax.profiler trace around chained steps at two training states
(init params and post-warmup params — the capacity-cascade tiers are
state-dependent) and prints the top ops by total self time via xprof's
op_profile converter.

Run solo:  timeout 2400 python scripts/profile_step.py
"""
import dataclasses
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def top_ops(logdir, n=30):
    from xprof.convert import raw_to_tool_data
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane found under", logdir)
        return
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            paths, "op_profile", {})
        tree = json.loads(data)

        rows = []

        def walk(node, depth=0):
            m = node.get("metrics", {})
            name = node.get("name", "?")
            kids = node.get("children", [])
            if not kids and m:
                rows.append((m.get("time", 0.0), name,
                             m.get("flops", 0.0)))
            for k in kids:
                walk(k, depth + 1)

        walk(tree.get("byProgram", tree))
        rows.sort(reverse=True)
        print(f"top {n} ops by time share:")
        for t, name, fl in rows[:n]:
            print(f"  {t:8.4f}  {name[:110]}")
    except Exception as e:
        print("op_profile parse failed:", repr(e))
        # fallback: framework_op_stats is a TSV-ish JSON
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                paths, "framework_op_stats", {})
            print(str(data)[:4000])
        except Exception as e2:
            print("framework_op_stats failed too:", repr(e2))


def main():
    import jax
    import jax.numpy as jnp
    from mvsdf_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_default_matmul_precision", "default")
    jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    t0 = time.perf_counter()
    float(jnp.ones(4).sum())
    print(f"first fetch: {time.perf_counter() - t0:.1f}s", flush=True)

    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    from tests.golden.scene_fixtures import make_scene

    cfg = MVSDFConfig(train=TrainConfig(batch_size=8, num_pixels=4096))
    tr = dataclasses.replace(
        cfg.model.tracer, fill_misses=False,
        sampler_capacity_frac=0.25, fill_capacity_frac=0.5,
        fallback_capacity_frac=(0.0625, 0.09375, 0.375),
        march_compact_schedule=((0, (0.375, 0.5)), (1, (0.1875, 0.25)),
                                (5, (0.0625, 0.125, 0.25))))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, use_pallas_trace=True, tracer=tr,
        supervised_compact_frac=(0.25, 0.375),
        implicit=dataclasses.replace(cfg.model.implicit,
                                     bf16_activations=True)))

    scene = make_scene(n_images=8, n_pix=4096, feat_ch=32, img_hw=96,
                       depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    state0 = init_train_state(cfg, seed=0)
    step = make_train_step(cfg, phase_idx=1, donate=False)
    w = weights_to_array(cfg.schedule.weights(0.3))
    key = jax.random.PRNGKey(0)

    # compile + warm
    st, metrics = step(state0, batch, w, key)
    float(np.asarray(metrics["loss"]))

    def timed(label, st_in, iters=10):
        t0 = time.perf_counter()
        st = st_in
        for _ in range(iters):
            st, m = step(st, batch, w, key)
        float(np.asarray(m["loss"]))
        dt = (time.perf_counter() - t0) / iters
        print(f"step[{label}]: {dt*1e3:.2f} ms "
              f"({8*4096/dt:,.0f} rays/s)", flush=True)
        return st

    timed("init-params", state0, iters=10)
    st = state0
    for _ in range(18):
        st, m = step(st, batch, w, key)
    float(np.asarray(m["loss"]))
    st18 = st
    timed("post-18-steps", st18, iters=10)

    logdir = "/tmp/mvsdf_prof"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        s2 = st18
        for _ in range(5):
            s2, m2 = step(s2, batch, w, key)
        float(np.asarray(m2["loss"]))
    top_ops(logdir)


if __name__ == "__main__":
    main()

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


def top_ops(logdir, n=25, n_steps=5):
    """Category + top-op breakdown by device rawTime (ps) per step.

    The op_profile tree is byProgram -> program -> CATEGORY -> op; the live
    metric key on this xprof build is ``rawTime`` (ps; the older ``time``
    share key reads 0 — round-5 finding, NOTES_ROUND6.md)."""
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
        bp = tree.get("byProgram", tree)
        ms = 1e-9 / n_steps  # ps -> ms/step
        progs = [c for c in bp.get("children", [])
                 if c.get("name") != "IDLE"]
        total = sum(c["metrics"]["rawTime"] for c in progs)
        print(f"device busy: {total * ms:.2f} ms/step "
              f"({len(progs)} programs)")
        cats = {}
        ops = []
        for prog in progs:
            for cat in prog.get("children", []):
                cname = cat.get("name", "?")
                cm = cat.get("metrics", {})
                e = cats.setdefault(cname, [0.0, 0, 0.0])
                e[0] += cm.get("rawTime", 0)
                e[1] += cm.get("occurrences", 0)
                e[2] += cm.get("rawFlops", 0)
                for op in cat.get("children", []):
                    om = op.get("metrics", {})
                    ops.append((om.get("rawTime", 0), cname,
                                op.get("name", "?"),
                                om.get("occurrences", 0)))
        print("by category (ms/step, count/step, GFLOP/step):")
        for cname, (t, occ, fl) in sorted(cats.items(),
                                          key=lambda kv: -kv[1][0]):
            print(f"  {t * ms:7.2f}  {occ / n_steps:6.0f}  "
                  f"{fl / n_steps / 1e9:8.1f}  {cname}")
        ops.sort(reverse=True)
        print(f"top {n} ops by device time (ms/step):")
        for t, cname, name, occ in ops[:n]:
            print(f"  {t * ms:7.2f}  x{occ / n_steps:5.0f}  "
                  f"[{cname[:18]}] {name[:80]}")
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

    # EXACT bench.py config (round 5): single 0.375 supervised tier,
    # donated step (keep in sync with bench.py's env-default branches).
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

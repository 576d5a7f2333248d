"""Round-5 A/B: direct predicated scatter into caller merge targets
(compact_call_into, round-5 HEAD) vs the round-4 layout (zeros
out_builders + call-site where-merges, legacy_compact_call_into), on the
bench config. Round-4 op_profile motivation: ~16 ms/step (27.7% of device
busy) in broadcast zero-materializations + where-merge cotangent bases
(PERF.md "Where the 57.9 ms goes").

Also measures two supervised-tier arms under the scatter layout (VERDICT
r4 #4): steady hit fraction is 0.30-0.32 (scripts/active_trajectory.py),
so the (0.25, 0.375) cascade's bottom tier never fits — one arm drops it
(pure branch-overhead removal), one resizes it to 0.3125.

Protocol: one process; alternating 10-step windows at steady state per
arm; one-step loss bit-equality across arms first (layout and exact tier
choice cannot change the forward); op_profile device-busy per arm.
Run solo:  timeout 4800 python scripts/scatter_into_ab.py
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
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    float(jnp.ones(4).sum())
    print(f"backend up in {time.perf_counter() - t0:.0f}s", flush=True)

    from mvsdf_tpu import compaction
    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.rendering import renderer as renderer_mod
    from mvsdf_tpu.tracing import sphere_trace as trace_mod
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    from tests.golden.scene_fixtures import make_scene

    def patch(impl):
        trace_mod._compact_call_into = impl
        renderer_mod._compact_call_into = impl

    scene = make_scene(n_images=8, n_pix=4096, feat_ch=32, img_hw=96,
                       depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    def build(sup):
        cfg = MVSDFConfig(train=TrainConfig(batch_size=8, num_pixels=4096))
        tr = dataclasses.replace(
            cfg.model.tracer, fill_misses=False,
            sampler_capacity_frac=0.25, fill_capacity_frac=0.5,
            fallback_capacity_frac=(0.0625, 0.09375, 0.375),
            march_compact_schedule=((0, (0.375, 0.5)), (1, (0.1875, 0.25)),
                                    (5, (0.0625, 0.125, 0.25))))
        return dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, use_pallas_trace=True, tracer=tr,
            supervised_compact_frac=sup,
            implicit=dataclasses.replace(cfg.model.implicit,
                                         bf16_activations=True)))

    # (impl, cfg) per arm; "legacy" reproduces the round-4 HEAD layout
    arms = {
        "legacy": (compaction.legacy_compact_call_into,
                   build((0.25, 0.375))),
        "scatter": (compaction.compact_call_into, build((0.25, 0.375))),
        "scatter_sup1": (compaction.compact_call_into, build((0.375,))),
        "scatter_supmid": (compaction.compact_call_into,
                           build((0.3125, 0.375))),
    }

    steps, states = {}, {}
    key = jax.random.PRNGKey(0)
    w = None
    eq = {}
    for name, (impl, cfg) in arms.items():
        patch(impl)
        st = init_train_state(cfg, seed=0)
        fn = make_train_step(cfg, phase_idx=1, donate=False)
        w = weights_to_array(cfg.schedule.weights(0.3))
        t0 = time.perf_counter()
        st, m = fn(st, batch, w, key)  # traces under the patch
        eq[name] = (float(np.asarray(m["loss"])),
                    float(np.asarray(m["grad_norm"])))
        for _ in range(2):
            st, m = fn(st, batch, w, key)
        float(np.asarray(m["loss"]))
        print(f"[{name}] compile {time.perf_counter()-t0:.1f}s "
              f"loss={eq[name][0]!r} gnorm={eq[name][1]!r}", flush=True)
        steps[name] = fn
        states[name] = st
    patch(compaction.compact_call_into)
    # layout + exact tier choice cannot change the forward: losses must be
    # BIT-equal; grad_norm may differ at backward reduction-order roundoff
    for name in arms:
        assert eq["legacy"][0] == eq[name][0], \
            f"{name} changed the forward: {eq}"
        rel = abs(eq["legacy"][1] - eq[name][1]) / abs(eq["legacy"][1])
        assert rel <= 1e-5, \
            f"{name} grad_norm beyond roundoff: {eq} rel={rel:.2e}"
        print(f"[{name}] equality: loss bit-equal, grad_norm rel "
              f"{rel:.1e}", flush=True)

    # advance all arms to steady state
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
        logdir = f"/tmp/mvsdf_sc_{name}"
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

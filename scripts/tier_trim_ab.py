"""Round-5 follow-up A/B (after scripts/scatter_into_ab.py adopted the
single 0.375 supervised tier, -2.3 ms device): apply the same
dead/mis-sized-tier treatment to the other cascades, plus re-try the fused
Pallas march at the current tier sizes (VERDICT r4 #3: march while-bodies
are the largest block, ~19.9 ms; the round-1 fused-march A/B was neutral
at OLD tier sizes).

Arms (all with the scatter-into layout and supervised (0.375,)):
  base    bench tiers: fallback (0.0625, 0.09375, 0.375), march
          ((0,(.375,.5)), (1,(.1875,.25)), (5,(.0625,.125,.25)))
  fb2     drop the 0.0625 fallback tier (steady sampler-active 0.06-0.076
          straddles it; the branch may cost more than the rare fit saves)
  march2  resize march tiers to the measured actives (iter1: 0.14 ->
          0.15625 tight; iter5: <0.10 -> 0.09375) and drop third tiers
  both    fb2 + march2
  pmarch  fused Pallas march kernel (use_pallas_march) at base tiers

Protocol: alternating 10-step windows at steady state, one-step loss
bit-equality first, op_profile device busy per arm.
Run solo:  timeout 4800 python scripts/tier_trim_ab.py
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

    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    from tests.golden.scene_fixtures import make_scene

    scene = make_scene(n_images=8, n_pix=4096, feat_ch=32, img_hw=96,
                       depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    BASE_MARCH = ((0, (0.375, 0.5)), (1, (0.1875, 0.25)),
                  (5, (0.0625, 0.125, 0.25)))
    TRIM_MARCH = ((0, (0.375, 0.5)), (1, (0.15625, 0.25)),
                  (5, (0.09375, 0.25)))

    def build(fallback, march, pallas_march=False):
        cfg = MVSDFConfig(train=TrainConfig(batch_size=8, num_pixels=4096))
        tr = dataclasses.replace(
            cfg.model.tracer, fill_misses=False,
            sampler_capacity_frac=0.25, fill_capacity_frac=0.5,
            fallback_capacity_frac=fallback,
            march_compact_schedule=march)
        return dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, use_pallas_trace=True, use_pallas_march=pallas_march,
            tracer=tr, supervised_compact_frac=(0.375,),
            implicit=dataclasses.replace(cfg.model.implicit,
                                         bf16_activations=True)))

    arms = {
        "base": build((0.0625, 0.09375, 0.375), BASE_MARCH),
        "fb2": build((0.09375, 0.375), BASE_MARCH),
        "march2": build((0.0625, 0.09375, 0.375), TRIM_MARCH),
        "both": build((0.09375, 0.375), TRIM_MARCH),
        "pmarch": build((0.0625, 0.09375, 0.375), BASE_MARCH,
                        pallas_march=True),
    }

    steps, states = {}, {}
    key = jax.random.PRNGKey(0)
    w = None
    eq = {}
    for name, cfg in arms.items():
        st = init_train_state(cfg, seed=0)
        fn = make_train_step(cfg, phase_idx=1, donate=False)
        w = weights_to_array(cfg.schedule.weights(0.3))
        t0 = time.perf_counter()
        st, m = fn(st, batch, w, key)
        eq[name] = (float(np.asarray(m["loss"])),
                    float(np.asarray(m["grad_norm"])))
        for _ in range(2):
            st, m = fn(st, batch, w, key)
        float(np.asarray(m["loss"]))
        print(f"[{name}] compile {time.perf_counter()-t0:.1f}s "
              f"loss={eq[name][0]!r} gnorm={eq[name][1]!r}", flush=True)
        steps[name] = fn
        states[name] = st
    # exact tier choice / bit-exact fused march cannot change the forward
    for name in arms:
        assert eq["base"][0] == eq[name][0], \
            f"{name} changed the forward: {eq}"
        rel = abs(eq["base"][1] - eq[name][1]) / abs(eq["base"][1])
        assert rel <= 1e-5, \
            f"{name} grad_norm beyond roundoff: {eq} rel={rel:.2e}"
    print("one-step equality across arms: OK", flush=True)

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
        logdir = f"/tmp/mvsdf_tt_{name}"
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

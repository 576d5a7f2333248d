"""Round-5 A/B: jax.checkpoint on the supervised compaction's tier fns.

lax.cond linearization unions both branches' residuals and ZERO-FILLS the
untaken branch's slots: the round-5 HLO of the adopted step shows ~50
f32/bf16/pred[32768,512] zero broadcasts (~5-8 ms/step, the whole
remaining 'broadcast' category) feeding the supervised cond's root tuple
— the dense branch's activation stack, materialized as zeros on every
step the 0.375 tier is taken. Remat shrinks the residual set to the
block-sized fn inputs and recomputes the tier forward in the backward.

Protocol: alternating 10-step windows at steady state; TWO-step loss
bit-equality (step-2 loss goes through step-1's gradients, so it
certifies the recomputed backward too).
Run solo:  timeout 3600 python scripts/remat_branch_ab.py
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
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    from tests.golden.scene_fixtures import make_scene

    scene = make_scene(n_images=8, n_pix=4096, feat_ch=32, img_hw=96,
                       depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    base = MVSDFConfig(train=TrainConfig(batch_size=8, num_pixels=4096))
    tr = dataclasses.replace(
        base.model.tracer, fill_misses=False,
        sampler_capacity_frac=0.25, fill_capacity_frac=0.5,
        fallback_capacity_frac=(0.0625, 0.09375, 0.375),
        march_compact_schedule=((0, (0.375, 0.5)), (1, (0.1875, 0.25)),
                                (5, (0.0625, 0.125, 0.25))))
    base = dataclasses.replace(base, model=dataclasses.replace(
        base.model, use_pallas_trace=True, tracer=tr,
        supervised_compact_frac=(0.375,),
        implicit=dataclasses.replace(base.model.implicit,
                                     bf16_activations=True)))
    arms = {
        "remat_off": dataclasses.replace(base, model=dataclasses.replace(
            base.model, supervised_remat=False)),
        "remat_on": dataclasses.replace(base, model=dataclasses.replace(
            base.model, supervised_remat=True)),
    }

    key = jax.random.PRNGKey(0)
    w = weights_to_array(arms["remat_off"].schedule.weights(0.3))
    steps, states, eq = {}, {}, {}
    for name, cfg in arms.items():
        st = init_train_state(cfg, seed=0)
        fn = make_train_step(cfg, phase_idx=1, donate=True)
        t0 = time.perf_counter()
        st, m = fn(st, batch, w, key)
        l1 = float(np.asarray(m["loss"]))
        st, m = fn(st, batch, w, key)
        l2 = float(np.asarray(m["loss"]))
        eq[name] = (l1, l2)
        for _ in range(21):
            st, m = fn(st, batch, w, key)
        float(np.asarray(m["loss"]))
        print(f"[{name}] compile+advance {time.perf_counter()-t0:.1f}s "
              f"loss1={l1!r} loss2={l2!r}", flush=True)
        steps[name], states[name] = fn, st
    # NOT bit-equal: remat changes XLA fusion boundaries, so reductions
    # reassociate (measured 3e-6 rel on step-1 loss). Gate at roundoff.
    ref = eq["remat_off"]
    for name, (l1, l2) in eq.items():
        d1 = abs(l1 - ref[0]) / max(abs(ref[0]), 1e-8)
        d2 = abs(l2 - ref[1]) / max(abs(ref[1]), 1e-8)
        print(f"[{name}] rel dev vs remat_off: step1 {d1:.2e} "
              f"step2 {d2:.2e}", flush=True)
        assert d1 < 1e-4 and d2 < 1e-4, f"{name} beyond roundoff: {eq}"
    print("two-step equality within roundoff: OK", flush=True)

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
        logdir = f"/tmp/mvsdf_remat_{name}"
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

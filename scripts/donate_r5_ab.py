"""Round-5 donate retry on the adopted stack (single 0.375 supervised
tier): round 4 measured donation -0.9 ms device / wall-neutral on the OLD
tier layout; re-check on the new one. Alternating 10-step windows.
Run solo:  timeout 2400 python scripts/donate_r5_ab.py
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
    steps, states = {}, {}
    for name, donate in (("nodonate", False), ("donate", True)):
        st = init_train_state(cfg, seed=0)
        fn = make_train_step(cfg, phase_idx=1, donate=donate)
        t0 = time.perf_counter()
        for _ in range(23):
            st, m = fn(st, batch, w, key)
        float(np.asarray(m["loss"]))
        print(f"[{name}] compile+advance {time.perf_counter()-t0:.1f}s "
              f"loss={float(np.asarray(m['loss'])):.4f}", flush=True)
        steps[name], states[name] = fn, st

    wins = {n: [] for n in steps}
    for rep in range(6):
        for name in steps:
            st = states[name]
            t0 = time.perf_counter()
            for _ in range(10):
                st, m = steps[name](st, batch, w, key)
            float(np.asarray(m["loss"]))
            wins[name].append((time.perf_counter() - t0) / 10 * 1e3)
            states[name] = st
    out = {}
    for name in steps:
        v = np.array(wins[name])
        out[name] = float(np.median(v))
        print(f"[{name}] windows ms: {np.round(v, 1).tolist()} "
              f"median {np.median(v):.2f}", flush=True)
    print(json.dumps({f"{n}_ms": round(out[n], 2) for n in out}),
          flush=True)


if __name__ == "__main__":
    main()

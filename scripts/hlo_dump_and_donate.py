"""Dump the compiled step HLO (with metadata) to /tmp/step_hlo.txt for
offline attribution of the broadcast/copy plumbing, and A/B donate=True
vs donate=False with alternating windows. ONE process.
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
    from mvsdf_tpu.train.step import (make_step_body, make_train_step,
                                      init_train_state, weights_to_array)
    from tests.golden.scene_fixtures import make_scene

    cfg = MVSDFConfig(train=TrainConfig(batch_size=8, num_pixels=4096))
    tr = dataclasses.replace(
        cfg.model.tracer, fill_misses=False,
        sampler_capacity_frac=0.25, fill_capacity_frac=0.5,
        fallback_capacity_frac=(0.0625, 0.1875, 0.375),
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
    state = init_train_state(cfg, seed=0)
    w = weights_to_array(cfg.schedule.weights(0.3))
    key = jax.random.PRNGKey(0)

    body = make_step_body(cfg, phase_idx=1)
    compiled = jax.jit(body).lower(state, batch, w, key).compile()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(compiled.as_text())
    print("HLO dumped:", os.path.getsize("/tmp/step_hlo.txt"), "bytes",
          flush=True)

    # --- donate A/B --------------------------------------------------------
    arms = {}
    for name, don in (("nodonate", False), ("donate", True)):
        fn = make_train_step(cfg, phase_idx=1, donate=don)
        st = init_train_state(cfg, seed=0)
        for _ in range(3):
            st, m = fn(st, batch, w, key)
        float(np.asarray(m["loss"]))
        arms[name] = (fn, st)

    wins = {n: [] for n in arms}
    for rep in range(6):
        for name in arms:
            fn, st = arms[name]
            t0 = time.perf_counter()
            for _ in range(10):
                st, m = fn(st, batch, w, key)
            float(np.asarray(m["loss"]))
            wins[name].append((time.perf_counter() - t0) / 10 * 1e3)
            arms[name] = (fn, st)
    for name in arms:
        v = np.array(wins[name])
        print(f"[{name}] windows ms: {np.round(v, 1).tolist()} "
              f"median {np.median(v):.2f}", flush=True)


if __name__ == "__main__":
    main()

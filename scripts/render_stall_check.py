"""Validate the first-full-render stall fix (VERDICT r3 #3).

Round 3 measured ~220 s once per process at the FIRST full eval render in
the training CLI (the second in the same process took 22 s): the plot
path ran render_forward EAGERLY per chunk, compiling hundreds of tiny
op-programs that all fall under the persistent cache's 1 s
min-compile-time threshold — so no process ever warmed the next one.
The fix (train/loop.py) renders through ONE jitted fixed-chunk program.

Run TWICE (two fresh processes). Pass criterion: the SECOND process's
first full render <= ~30 s (persistent-cache hit + chunk dispatches).

    timeout 1800 python scripts/render_stall_check.py --scene /tmp/stallsc
"""
import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True,
                    help="scene dir written by make_synthetic_scene.py")
    ap.add_argument("--exp", default="/tmp/mvsdf_stall_exp")
    args = ap.parse_args()

    import jax
    from mvsdf_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_default_matmul_precision", "default")
    import jax.numpy as jnp
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    float(jnp.ones(4).sum())
    print(f"backend init+fetch: {time.perf_counter() - t0:.1f}s",
          flush=True)

    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.data.scene import SceneData
    from mvsdf_tpu.train.loop import Trainer
    from mvsdf_tpu.tracing.sphere_trace import (auto_fallback_cascade,
                                                auto_march_schedule,
                                                ray_intersect_fraction)

    scene = SceneData(args.scene, allow_random_features=True)
    cfg = MVSDFConfig(train=TrainConfig(batch_size=8, num_pixels=4096,
                                        nepochs=1800))
    # the capstone CLI stack: pallas trace + cascades + bf16 acts
    obj_frac = float(np.mean(scene.masks))
    uv_all = np.broadcast_to(scene.uv[None],
                             (scene.n_images,) + scene.uv.shape)
    isect = ray_intersect_fraction(uv_all, scene.intrinsics, scene.poses)
    tr = dataclasses.replace(
        cfg.model.tracer, fill_misses=False,
        sampler_capacity_frac=0.25, fill_capacity_frac=0.5,
        fallback_capacity_frac=auto_fallback_cascade(
            obj_frac, intersect_frac=isect, fill_misses=False),
        march_compact_schedule=auto_march_schedule(
            obj_frac, intersect_frac=isect))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, use_pallas_trace=True, shard_map_trace=True, tracer=tr,
        implicit=dataclasses.replace(cfg.model.implicit,
                                     bf16_activations=True)))

    trainer = Trainer(cfg, scene, args.exp)
    for i in range(2):
        t0 = time.perf_counter()
        trainer.plot(epoch=i, full=True)
        print(f"full plot render #{i + 1}: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()

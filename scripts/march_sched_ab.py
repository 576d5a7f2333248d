"""A/B the mid-march compaction schedules at a TRAINED checkpoint.

The tight-tier constants of ``auto_march_schedule`` were fitted to one
scene's measured trained-state decay (scripts/march_decay.py); this script
measures, at a real trained checkpoint (or the untrained init for
contrast), the full no-grad trace time under:

  dense    no march compaction (reference-parity march)
  old      single tier per segment = the auto schedule's loosest tier
           (the pre-cascade behavior: overflow -> full dense segment)
  cascade  the shipped tight/over auto_march_schedule

Timing chains iterations with a host fetch at the end (PERF.md "Timing
methodology" — naive block_until_ready lies on the tunneled backend).

    python scripts/march_sched_ab.py --data_dir /tmp/cli_e2e/scene \
        --exps /tmp/cli_e2e/exps/capstone
"""
import argparse
import dataclasses
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITERS = 10


def chain_time(fn, label):
    c = fn(jnp.float32(0.0)) * 0
    _ = float(c)
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        c = fn(c)
    _ = float(c)
    dt = (time.perf_counter() - t0) / N_ITERS
    print(f"{label:30s} {dt*1e3:8.1f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--exps", default="",
                    help="experiment dir (exps/<name>); empty = untrained "
                         "geometric init")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_pix", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "default")
    jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))

    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.data.scene import SceneData
    from mvsdf_tpu.train.step import init_train_state
    from mvsdf_tpu.train import checkpoints as ckpt
    from mvsdf_tpu.rendering.renderer import _frozen_trace
    from mvsdf_tpu.geometry.cameras import get_camera_params
    from mvsdf_tpu.tracing.sphere_trace import (auto_fallback_cascade,
                                                auto_march_schedule,
                                                ray_intersect_fraction)

    scene = SceneData(args.data_dir, allow_random_features=True,
                      load_features=False)

    cfg = MVSDFConfig(train=TrainConfig(batch_size=args.batch,
                                        num_pixels=args.n_pix))
    state = init_train_state(cfg, seed=0)
    label = "untrained(init)"
    if args.exps:
        stamps = sorted(os.listdir(args.exps))
        ckdir = os.path.join(args.exps, stamps[-1], "checkpoints")
        state, _ = ckpt.restore_checkpoint(ckdir, None, state)
        label = f"trained(step {int(state.epoch)})"
    params = jax.lax.stop_gradient(state.params)

    obj_frac = float(np.mean(scene.masks))
    uv_all = np.broadcast_to(scene.uv[None],
                             (scene.n_images,) + scene.uv.shape)
    isect = ray_intersect_fraction(uv_all, scene.intrinsics, scene.poses)
    cap = auto_fallback_cascade(obj_frac, intersect_frac=isect)
    sched_new = auto_march_schedule(obj_frac, intersect_frac=isect)
    sched_old = tuple((s, (tiers[-1],)) for s, tiers in sched_new)
    print(f"{label}; object_frac={obj_frac:.3f} intersect={isect:.3f}")
    print(f"fallback cascade {cap}")
    print(f"old (loosest-tier) schedule {sched_old}")
    print(f"new cascade schedule        {sched_new}")

    # batch: args.batch images x n_pix rays, the training trace shape
    rng = np.random.default_rng(args.seed)
    img_idx = rng.permutation(scene.n_images)[:args.batch]
    sel = rng.permutation(scene.uv.shape[0])[:args.n_pix]
    uv = jnp.asarray(np.stack([scene.uv[sel] for _ in img_idx]))
    pose = jnp.asarray(scene.poses[img_idx])
    intr = jnp.asarray(scene.intrinsics[img_idx])
    om = jnp.asarray(scene.masks[img_idx][:, sel])
    ray_dirs, cam_loc = get_camera_params(uv, pose, intr)
    org = jnp.broadcast_to(cam_loc[:, None, :], ray_dirs.shape)
    key = jax.random.PRNGKey(args.seed)
    ms = jax.random.uniform(key, (cfg.model.tracer.n_steps,))

    results = {}
    for name, sched in (("dense", ()), ("old", sched_old),
                        ("cascade", sched_new)):
        tr = dataclasses.replace(cfg.model.tracer,
                                 sampler_capacity_frac=0.25,
                                 fill_capacity_frac=0.5,
                                 fallback_capacity_frac=cap,
                                 march_compact_schedule=sched)
        mcfg = dataclasses.replace(
            cfg.model, tracer=tr, use_pallas_trace=True,
            pallas_interpret=jax.devices()[0].platform == "cpu")

        @jax.jit
        def trace_once(c, mcfg=mcfg):
            t = _frozen_trace(mcfg, params, org, ray_dirs + c * 1e-12, om,
                              True, ms)
            return jnp.mean(t.dists)

        results[name] = chain_time(trace_once, f"march={name}")

    base = results["dense"]
    for name in ("old", "cascade"):
        print(f"{name}: {100 * (base - results[name]) / base:+.1f}% vs dense")


if __name__ == "__main__":
    main()

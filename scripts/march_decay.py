"""Diagnostic: per-iteration active-lane decay of the bidirectional march.

Measures how many rays remain unfinished after each sphere-tracing
iteration on the bench fixture (full-size model, batch 8 x 4096 rays) —
this sizes the win available from mid-march compaction: the march is
FLOP-bound (PERF.md), so evaluating only still-active rays after
iteration k saves roughly (1 - active_frac) of the remaining march cost.

Instrumented re-statement of tracing/sphere_trace._sphere_trace with a
fixed-trip lax.scan so per-iteration counts come out; the march update
rule is identical (masked lanes frozen).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def instrumented_march(cfg, sdf_fn, org, dirs, mask_intersect, t_near,
                       t_far):
    """Same update rule as _sphere_trace, fixed trips, returns per-iter
    (active rays, line-search evals proxy)."""
    thr = cfg.sdf_threshold
    clip = cfg.dist_clip
    org2 = jnp.stack([org, org])
    dirs2 = jnp.stack([dirs, dirs])
    sign2 = jnp.concatenate(
        [jnp.ones((1,) + (1,) * mask_intersect.ndim),
         -jnp.ones((1,) + (1,) * mask_intersect.ndim)])

    def eval_masked(t2, m2):
        p = org2 + t2[..., None] * dirs2
        v = jnp.clip(sdf_fn(p), -clip, clip)
        return jnp.where(m2, v, 0.0)

    unfin2 = jnp.stack([mask_intersect, mask_intersect])
    t2 = jnp.where(unfin2, jnp.stack([t_near, t_far]), 0.0)
    next2 = eval_masked(t2, unfin2)

    def line_search(t2, curr2, next2):
        def cond(state):
            j, _, not_proj, _ = state
            return (j < cfg.line_step_iters) & jnp.any(not_proj)

        def body(state):
            j, t2, not_proj, next2 = state
            step = ((1 - cfg.line_search_step) / (2.0 ** j)) * curr2
            t2 = jnp.where(not_proj, t2 - sign2 * step, t2)
            p = org2 + t2[..., None] * dirs2
            v = jnp.clip(sdf_fn(p), -clip, clip)
            next2 = jnp.where(not_proj, v, next2)
            return j + 1, t2, next2 < 0, next2

        not_proj = next2 < 0
        nproj0 = jnp.sum(not_proj)
        _, t2, _, next2 = jax.lax.while_loop(
            cond, body, (0, t2, not_proj, next2))
        return t2, next2, nproj0

    def mask_update(unfin2, next2):
        curr2 = jnp.where(unfin2, next2, 0.0)
        curr2 = jnp.where(curr2 <= thr, 0.0, curr2)
        return unfin2 & (curr2 > thr), curr2

    def body(state, _):
        unfin2, t2, next2 = state
        unfin2, curr2 = mask_update(unfin2, next2)
        t2n = t2 + sign2 * curr2
        next2n = eval_masked(t2n, unfin2)
        t2n, next2n, nproj = line_search(t2n, curr2, next2n)
        ok = t2n[0] < t2n[1]
        unfin2 = unfin2 & ok[None]
        # active RAYS (either direction still marching) after this iter
        n_active = jnp.sum(unfin2[0] | unfin2[1])
        return (unfin2, t2n, next2n), (n_active, nproj)

    (unfin2, t2, next2), (per_iter, nproj) = jax.lax.scan(
        body, (unfin2, t2, next2), None, length=cfg.sphere_tracing_iters)
    unfin2, _ = mask_update(unfin2, next2)
    return unfin2, t2, per_iter, nproj


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", default="",
                    help="measure on a real on-disk scene instead of the "
                         "bench fixture")
    ap.add_argument("--checkpoint_dir", default="",
                    help="restore trained params from this orbax dir "
                         "(default: init / DECAY_TRAIN_STEPS warm steps)")
    ap.add_argument("--params_pkl", default="",
                    help="load trained params from a pickle written by "
                         "full_training_validation.py (params.pkl)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "default")
    jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))

    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    from mvsdf_tpu.fields.sdf import sdf_apply
    from mvsdf_tpu.geometry.cameras import get_camera_params
    from tests.golden.scene_fixtures import make_scene

    n_images, n_pix = 8, 4096
    cfg = MVSDFConfig(train=TrainConfig(batch_size=n_images,
                                        num_pixels=n_pix))
    state = init_train_state(cfg, seed=0)

    if args.scene_dir:
        from mvsdf_tpu.data.scene import SceneData
        sd = SceneData(args.scene_dir, allow_random_features=True)
        sd.change_sampling_idx(n_pix, np.random.default_rng(0))
        idx = np.arange(min(n_images, sd.n_images))
        batch = {k: jnp.asarray(np.asarray(v))
                 for k, v in sd.get_batch(list(idx)).items()}
    else:
        scene = make_scene(n_images=n_images, n_pix=n_pix, feat_ch=32,
                           img_hw=96, depth_hw=48)
        batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    if args.params_pkl:
        import pickle
        with open(args.params_pkl, "rb") as f:
            params_loaded = pickle.load(f)
        state = state._replace(params=jax.tree_util.tree_map(
            jnp.asarray, params_loaded))
        print(f"loaded params from {args.params_pkl}", flush=True)
    elif args.checkpoint_dir:
        from mvsdf_tpu.train.checkpoints import restore_checkpoint
        state, _ = restore_checkpoint(args.checkpoint_dir, None, state)
        print(f"restored epoch {int(state.epoch)}", flush=True)
    else:
        n_warm_steps = int(os.environ.get("DECAY_TRAIN_STEPS", "20"))
        if n_warm_steps:
            step = make_train_step(cfg, phase_idx=1, donate=False)
            w = weights_to_array(cfg.schedule.weights(0.3))
            key = jax.random.PRNGKey(0)
            t0 = time.perf_counter()
            for _ in range(n_warm_steps):
                state, m = step(state, batch, w, key)
            jax.block_until_ready(m["loss"])
            print(f"{n_warm_steps} warm steps: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)

    icfg, tcfg = cfg.model.implicit, cfg.model.tracer
    uv = batch["uv"]
    B, P, _ = uv.shape
    ray_dirs, cam_loc = get_camera_params(uv, batch["pose"],
                                          batch["intrinsics"])
    org = jnp.broadcast_to(cam_loc[:, None, :], (B, P, 3))
    params = jax.lax.stop_gradient(state.params)
    sdf_fn = lambda x: sdf_apply(icfg, params["implicit"], x)

    r = tcfg.object_bounding_sphere
    d_dot_o = jnp.sum(ray_dirs * org, axis=-1)
    under = d_dot_o ** 2 - (jnp.sum(org ** 2, axis=-1) - r ** 2)
    mask_intersect = under > 0
    sq = jnp.sqrt(jnp.where(mask_intersect, under, 0.0))
    t_near = jnp.clip(jnp.where(mask_intersect, -d_dot_o - sq, 0.0), 0.0)
    t_far = jnp.clip(jnp.where(mask_intersect, -d_dot_o + sq, 0.0), 0.0)

    f = jax.jit(lambda o, d, mi, tn, tf: instrumented_march(
        tcfg, sdf_fn, o, d, mi, tn, tf))
    unfin2, t2, per_iter, nproj = jax.block_until_ready(
        f(org, ray_dirs, mask_intersect, t_near, t_far))
    R = B * P
    print(f"total rays {R}, intersecting "
          f"{int(jnp.sum(mask_intersect))}")
    for i, (n, np_) in enumerate(zip(np.asarray(per_iter),
                                     np.asarray(nproj))):
        print(f"iter {i}: active rays after = {int(n):6d} "
              f"({int(n)/R:.3f})  line-search lanes entering = {int(np_)}")
    print(f"final sampler rays (unfin start): {int(jnp.sum(unfin2[0]))}")


if __name__ == "__main__":
    main()

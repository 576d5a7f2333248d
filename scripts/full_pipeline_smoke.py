"""Full-pipeline smoke at production scale on the attached accelerator:

  1. train the FULL-SIZE model (9x512 SDF MLP, 4-layer 512 radiance) on a
     synthetic 10-camera sphere scene for N epochs (pallas trace kernel +
     compaction, the bench configuration);
  2. extract the mesh on a dense grid via the fused SDF kernel + marching
     tetrahedra, keep the biggest component;
  3. color vertices by the surface indicator, trim with the native C++
     max-flow mesh cutter;
  4. render one full view and compute masked PSNR.

Writes artifacts under --out (default /tmp/mvsdf_smoke) and prints a JSON
summary line. ~6-8 min including compiles on a tunneled v5e.
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--out", default="/tmp/mvsdf_smoke")
    ap.add_argument("--no_pallas", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "default")
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))

    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.fields.sdf import sdf_apply, implicit_apply
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    from mvsdf_tpu.rendering import render_forward
    from mvsdf_tpu.eval.marching import extract_mesh
    from mvsdf_tpu.eval.mesh import biggest_component, save_obj
    from mvsdf_tpu.eval.psnr import masked_psnr
    from mvsdf_tpu.meshcut import trim_mesh
    from tests.golden.scene_fixtures import make_scene_fibonacci

    RADIUS = 0.45
    cfg = MVSDFConfig(train=TrainConfig(batch_size=10, num_pixels=4096,
                                        nepochs=max(args.steps, 10),
                                        learning_rate=5e-5,
                                        skip_nonfinite_updates=True))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, implicit_diff_min_dot=1e-2))
    if not args.no_pallas:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, use_pallas_trace=True))
        tr = dataclasses.replace(cfg.model.tracer,
                                 sampler_capacity_frac=0.25,
                                 fill_capacity_frac=0.5)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, tracer=tr))

    scene = make_scene_fibonacci(n=10, n_pix=cfg.train.num_pixels,
                                 feat_ch=32, sphere_radius=RADIUS,
                                 img_hw=96, depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    state = init_train_state(cfg, seed=0)
    step = make_train_step(cfg, phase_idx=0, donate=False)
    w = weights_to_array(cfg.schedule.weights(0.0))
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, w, key)
    jax.block_until_ready(metrics["loss"])
    print(f"step compiled in {time.perf_counter() - t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    for i in range(args.steps - 1):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, w, k)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    rays_s = (args.steps - 1) * 10 * cfg.train.num_pixels / max(dt, 1e-9)
    print(f"trained {args.steps} steps: loss={float(metrics['loss']):.4f} "
          f"depth={float(metrics['depth_loss']):.4f} "
          f"hit={float(metrics['hit_frac']):.2f} rays/s={rays_s:.0f}",
          flush=True)

    params = state.params
    icfg = cfg.model.implicit
    if args.no_pallas:
        def sdf(x):
            return sdf_apply(icfg, params["implicit"], x)
    else:
        from mvsdf_tpu.tracing.pallas import (pack_sdf_weights,
                                              make_pallas_sdf_fn)
        packed = pack_sdf_weights(icfg, params["implicit"])
        sdf = make_pallas_sdf_fn(icfg, packed)

    t0 = time.perf_counter()
    verts, faces = extract_mesh(sdf, resolution=args.resolution,
                                bounds=(-0.7, 0.7), slab=16)
    verts, faces = biggest_component(verts, faces)
    t_mesh = time.perf_counter() - t0
    print(f"mesh: {len(verts)} verts {len(faces)} faces in {t_mesh:.1f}s",
          flush=True)

    # surface-indicator colors + native max-flow trim
    surf = jax.nn.sigmoid(implicit_apply(
        icfg, params["implicit"],
        jnp.asarray(verts, jnp.float32))[..., 1])
    surf = np.asarray(surf)
    colors = np.stack([1 - surf, surf, np.zeros_like(surf)], -1)
    save_obj(os.path.join(args.out, "surface.obj"), verts, faces, colors)
    v2, f2, c2 = trim_mesh(verts, faces, colors, thresh=128, smooth=10)
    save_obj(os.path.join(args.out, "surface_trimmed.obj"), v2, f2, c2)
    print(f"mesh_cut: kept {len(f2)}/{len(faces)} faces", flush=True)

    # accuracy vs the analytic sphere (supervised region)
    keep = np.linalg.norm(verts, axis=1) < 0.54
    r = np.linalg.norm(verts[keep], axis=1)
    med_r = float(np.median(r)) if keep.any() else float("nan")

    # render one full view, masked PSNR vs (noise) ground truth
    H = W = 96
    uv = np.stack(np.meshgrid(np.arange(W), np.arange(H)),
                  -1).reshape(-1, 2).astype(np.float32)
    rows = []
    for s in range(0, H * W, 4608):
        sel = slice(s, min(s + 4608, H * W))
        inputs = {
            "uv": jnp.asarray(uv[sel][None]),
            "intrinsics": jnp.asarray(np.asarray(scene["intrinsics"])[:1]),
            "pose": jnp.asarray(np.asarray(scene["pose"])[:1]),
            "object_mask": jnp.ones((1, uv[sel].shape[0]), bool),
        }
        out = render_forward(cfg.model, params, inputs, training=False)
        rows.append(np.asarray(out.rgb_values[0]))
    rgb = (np.concatenate(rows, 0).reshape(H, W, 3) + 1) / 2
    mask = np.ones((H, W, 1))
    gt = np.zeros((H, W, 3)) + 0.5
    psnr = masked_psnr(rgb * mask, gt * mask, mask)

    summary = {
        "steps": args.steps,
        "rays_per_s": round(rays_s, 1),
        "final_loss": round(float(metrics["loss"]), 4),
        "mesh_verts": int(len(verts)),
        "trimmed_faces": int(len(f2)),
        "median_radius": round(med_r, 4),
        "target_radius": RADIUS,
        "render_psnr_vs_gray": round(psnr, 2),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

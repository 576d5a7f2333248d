"""Evaluation CLI: mesh extraction (+ optional rendering PSNR).

Usage parity with the reference (``code/evaluation/eval.py:248-284``):
    python -m mvsdf_tpu.eval.cli --data_dir DATA --expname NAME \
        [--resolution 512] [--eval_rendering]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="mvsdf-tpu evaluation")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--expname", default="mvsdf")
    ap.add_argument("--exps_folder", default="exps")
    ap.add_argument("--evals_folder", default="evals")
    ap.add_argument("--timestamp", default="latest")
    ap.add_argument("--checkpoint", default="latest")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--eval_rendering", action="store_true")
    ap.add_argument("--chunk_pixels", type=int, default=10000)
    ap.add_argument("--render_mode", action="store_true",
                    help="high-quality tracing (dist clip 0.05, 40 iters; "
                         "the reference's IDR_RENDER=1) and skip the mesh")
    ap.add_argument("--only_cam", default="",
                    help="free-viewpoint rendering: path to a cameras npz "
                         "(world_mat_i/scale_mat_i); renders those views "
                         "without images (the reference's IDR_ONLY_CAM=1)")
    ap.add_argument("--only_cam_size", default="",
                    help="HxW output resolution for --only_cam")
    ap.add_argument("--pallas", action="store_true",
                    help="fused TPU kernel for grid SDF evaluation and "
                         "for the ray trace in the rendering paths")
    ap.add_argument("--eval_cameras", action="store_true",
                    help="evaluate optimized camera poses against GT "
                         "(requires a --train_cameras checkpoint; the "
                         "reference's --eval_cameras, eval.py:26-104): "
                         "prints R/t errors, aligns the mesh by the "
                         "camera similarity, renders with optimized poses")
    ap.add_argument("--keep_all_components", action="store_true",
                    help="skip the biggest-connected-component cleanup "
                         "(the reference always keeps only the biggest, "
                         "eval.py:120 — correct when the object touches "
                         "the table; use this for floating objects)")
    ap.add_argument("--platform", default="",
                    help="force a jax platform (e.g. cpu)")
    ap.add_argument("--conf", default="",
                    help="HOCON config matching the trained checkpoint")
    ap.add_argument("--dtu_stl", default="",
                    help="official-protocol DTU chamfer: path to the scan's "
                         "ground-truth STL point cloud (.ply); evaluates "
                         "the extracted world-coordinates mesh")
    ap.add_argument("--dtu_obsmask", default="",
                    help="ObsMask<scan>_10.mat for the observability-grid "
                         "crop (optional but required for protocol parity)")
    ap.add_argument("--dtu_plane", default="",
                    help="Plane<scan>.mat ground-plane filter for "
                         "completeness (optional)")
    ap.add_argument("--dtu_max_dist", type=float, default=20.0)
    ap.add_argument("--dtu_downsample", type=float, default=0.2,
                    help="densify/downsample density in mm")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ..compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from ..config import MVSDFConfig
    from ..data.scene import SceneData
    from ..train.step import init_train_state
    from ..train import checkpoints as ckpt
    from ..fields.sdf import sdf_apply, implicit_apply
    from ..rendering import render_forward
    from .marching import extract_mesh
    from .mesh import biggest_component, save_obj
    from .psnr import masked_psnr

    if args.conf:
        from ..hocon import config_from_hocon
        cfg = config_from_hocon(args.conf)
    else:
        cfg = MVSDFConfig()
    if args.pallas:
        # fused trace kernel for the rendering paths too (the grid SDF
        # evaluation below has its own pallas toggle); the trace only
        # locates surface points — rgb is still evaluated in f32. Mosaic
        # kernels need the TPU backend; on cpu (smoke runs) fall back to
        # interpret mode like the train CLI.
        import dataclasses as _dc
        import jax as _jax
        cfg = _dc.replace(cfg, model=_dc.replace(
            cfg.model, use_pallas_trace=True,
            pallas_interpret=_jax.devices()[0].platform == "cpu"))
    if args.render_mode:
        # ref ray_tracing.py:127-131 + eval.py:106-107
        import dataclasses
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, tracer=dataclasses.replace(
                cfg.model.tracer, dist_clip=0.05, sphere_tracing_iters=40)))
    exp_base = os.path.join(args.exps_folder, args.expname)
    stamp = args.timestamp
    if stamp == "latest":
        stamps = sorted(os.listdir(exp_base))
        stamp = stamps[-1]
    ckpt_dir = os.path.join(exp_base, stamp, "checkpoints")
    evaldir = os.path.join(args.evals_folder, args.expname)
    os.makedirs(evaldir, exist_ok=True)

    scene = None
    if args.eval_cameras:
        import dataclasses
        scene = SceneData(args.data_dir, load_features=False)
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, train_cameras=True))
        state = init_train_state(cfg, seed=0, pose_init=scene.poses)
    else:
        state = init_train_state(cfg, seed=0)
    step = None if args.checkpoint == "latest" else int(args.checkpoint)
    state, _ = ckpt.restore_checkpoint(ckpt_dir, step, state)
    params = state.params
    epoch = int(state.epoch)

    if args.only_cam:
        _render_only_cam(args, cfg, params, evaldir)
        return

    if scene is None:
        scene = SceneData(args.data_dir, load_features=False)

    # --- camera accuracy + mesh alignment (ref eval.py:89-106) -----------
    cams_transformation = None
    opt_poses = None
    if args.eval_cameras:
        if state.pose_vecs is None:
            raise ValueError("--eval_cameras needs a checkpoint trained "
                             "with --train_cameras (no pose_vecs found)")
        from ..geometry.cameras import quat_to_rot
        from .cameras import camera_accuracy
        pv = np.asarray(state.pose_vecs)
        pred_Rs = np.asarray(quat_to_rot(jnp.asarray(pv[:, :4])))
        pred_ts = pv[:, 4:].astype(np.float64)
        gt_pose = scene.get_gt_pose()
        acc = camera_accuracy(pred_Rs, pred_ts,
                              gt_pose[:, :3, :3], gt_pose[:, :3, 3])
        msg = ("CAMERAS EVALUATION: R error mean = %.2f ; t error mean = "
               "%.2f ; R error median = %.2f ; t error median = %.2f" % (
                   acc["R_errors_deg"].mean(), acc["t_errors"].mean(),
                   np.median(acc["R_errors_deg"]),
                   np.median(acc["t_errors"])))
        print(msg)
        with open(os.path.join(evaldir, "cameras.txt"), "w") as f:
            f.write(msg + "\n")
        cams_transformation = np.eye(4)
        cams_transformation[:3, :3] = acc["scale"] * acc["R_opt"]
        cams_transformation[:3, 3] = acc["t_opt"]
        opt_poses = pv  # (n, 7) quat+t rows, accepted as "pose" input

    # --- mesh extraction (ref eval.py:109-125) ---------------------------
    icfg = cfg.model.implicit

    if args.pallas:
        from ..tracing.pallas import pack_sdf_weights, make_pallas_sdf_fn
        packed = pack_sdf_weights(icfg, params["implicit"])
        sdf = make_pallas_sdf_fn(icfg, packed,
                                 interpret=cfg.model.pallas_interpret)
    else:
        def sdf(x):
            return sdf_apply(icfg, params["implicit"], x)

    if not args.render_mode:
        # with optimized cameras the mesh lives in the training frame; map
        # it to GT world by the camera alignment (ref eval.py:116-123)
        world = (cams_transformation if cams_transformation is not None
                 else scene.get_scale_mat())
        verts, faces = extract_mesh(sdf, resolution=args.resolution,
                                    scale_mat=world)
        if not args.keep_all_components:
            verts, faces = biggest_component(verts, faces)
        # surface-indicator vertex colors (ref plots.py:179-203): red = 1-s
        vu = (verts - world[:3, 3]) @ np.linalg.inv(world[:3, :3]).T
        surf = jax.nn.sigmoid(implicit_apply(
            icfg, params["implicit"], jnp.asarray(vu, jnp.float32))[..., 1])
        surf = np.asarray(surf)
        colors = np.stack([1 - surf, surf, np.zeros_like(surf)], -1)
        out_obj = os.path.join(evaldir,
                               f"surface_world_coordinates_{epoch}.obj")
        save_obj(out_obj, verts, faces, colors)
        print(f"mesh: {len(verts)} verts {len(faces)} faces -> {out_obj}")
        # interactive scene artifact (ref plots.py:12-65 emits plotly HTML;
        # here a self-contained WebGL viewer): mesh w/ indicator colors +
        # camera cones
        from .html_viewer import write_scene_html
        world_poses = np.asarray(scene.poses).copy()
        world_poses[:, :3, 3] = (world_poses[:, :3, 3]
                                 @ world[:3, :3].T) + world[:3, 3]
        world_poses[:, :3, :3] = np.einsum(
            "ij,njk->nik", world[:3, :3], world_poses[:, :3, :3])
        out_html = os.path.join(evaldir, f"scene_{epoch}.html")
        write_scene_html(out_html, verts, faces, poses=world_poses,
                         vert_colors=colors, title=args.expname)
        print(f"interactive scene -> {out_html}")

        # --- official DTU protocol chamfer (ref README.md:78-79) ---------
        if args.dtu_stl:
            from ..data.convert import load_ply_points
            from .dtu_eval import (dtu_official_eval_mesh, load_obs_mask,
                                   load_ground_plane)
            stl = load_ply_points(args.dtu_stl)
            mask_kw = {}
            if args.dtu_obsmask:
                m, bb, res = load_obs_mask(args.dtu_obsmask)
                mask_kw.update(obs_mask=m, bb=bb, res=res)
            if args.dtu_plane:
                mask_kw.update(
                    ground_plane=load_ground_plane(args.dtu_plane))
            dtu = dtu_official_eval_mesh(
                verts, faces, stl, thresh=args.dtu_downsample,
                max_dist=args.dtu_max_dist, **mask_kw)
            msg = (f"DTU EVALUATION {args.expname}: accuracy = "
                   f"{dtu['accuracy']:.4f} ; completeness = "
                   f"{dtu['completeness']:.4f} ; overall = "
                   f"{dtu['overall']:.4f}")
            print(msg)
            with open(os.path.join(evaldir, "chamfer.txt"), "w") as f:
                f.write(msg + "\n")

    # --- rendering eval (ref eval.py:127-185) ----------------------------
    if args.eval_rendering:
        from PIL import Image
        images_dir = os.path.join(evaldir, "rendering")
        os.makedirs(images_dir, exist_ok=True)
        H, W = scene.img_res
        psnrs = []
        # one compiled program serves every chunk: jit once, pad the tail
        chunk = min(args.chunk_pixels, scene.total_pixels)

        if args.pallas:
            # eval-mode trace compaction: the 100-sample fallback only
            # serves march-unfinished rays (tiny for a trained SDF) and
            # marching rays are a subset of sphere-intersecting rays —
            # cascade capacities, exact with dense overflow (PERF.md)
            import dataclasses as _dc
            from ..tracing.sphere_trace import (auto_march_schedule,
                                                ray_intersect_fraction)
            uv_all = np.broadcast_to(
                scene.uv[None], (scene.n_images,) + scene.uv.shape)
            isect = ray_intersect_fraction(uv_all, scene.intrinsics,
                                           scene.poses)
            sched = auto_march_schedule(1.0, intersect_frac=isect)
            cfg = _dc.replace(cfg, model=_dc.replace(
                cfg.model, tracer=_dc.replace(
                    cfg.model.tracer,
                    sampler_capacity_frac=(0.0625, 0.25),
                    march_compact_schedule=sched)))
            print(f"render compaction: sampler (0.0625, 0.25), march "
                  f"{sched} (intersect {isect:.3f})")

        # ONE jitted program per fixed chunk shape, dispatched per chunk
        # from a host loop. A lax.map over chunks (one dispatch per image)
        # deterministically crashes the TPU compiler (SIGILL in
        # TpuPriorityFusionQueue::NormalizedComputationCost) when n_chunks
        # > 1 — the outer map nests over the trace's internal sample-axis
        # lax.map. Host-looped dispatches pipeline on the device, so the
        # per-dispatch overhead overlaps with compute.
        n_chunks = -(-scene.total_pixels // chunk)
        sel_all = np.concatenate(
            [np.arange(scene.total_pixels),
             np.zeros(n_chunks * chunk - scene.total_pixels, np.int64)]
        ).reshape(n_chunks, chunk)

        @jax.jit
        def _render_chunk(p, uv1, intr, pose, m1):
            inputs = {"uv": uv1[None], "intrinsics": intr[None],
                      "pose": pose[None], "object_mask": m1[None]}
            return render_forward(cfg.model, p, inputs,
                                  training=False).rgb_values[0]

        uv_chunks = jnp.asarray(scene.uv[sel_all])
        for idx in range(scene.n_images):
            pose = (opt_poses[idx] if opt_poses is not None
                    else scene.poses[idx])
            intr_d = jnp.asarray(scene.intrinsics[idx])
            pose_d = jnp.asarray(pose)
            mask_chunks_d = jnp.asarray(scene.masks[idx][sel_all])
            out = [_render_chunk(params, uv_chunks[c], intr_d, pose_d,
                                 mask_chunks_d[c])
                   for c in range(n_chunks)]
            rgb = np.concatenate([np.asarray(o) for o in out])
            rgb = rgb.reshape(-1, 3)[:scene.total_pixels]
            rgb = rgb.reshape(H, W, 3)
            rgb = (rgb + 1) / 2
            Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(
                np.uint8)).save(
                os.path.join(images_dir, f"eval_{idx:03d}.png"))
            mask_src = (scene.perfect_masks if scene.perfect_masks
                        is not None else scene.masks)
            mask = mask_src[idx].reshape(H, W, 1)
            gt = (scene.rgb[idx].reshape(H, W, 3) + 1) / 2
            psnrs.append(masked_psnr(rgb * mask, gt * mask, mask))
        msg = (f"RENDERING EVALUATION {args.expname}: psnr mean = "
               f"{np.mean(psnrs):.2f} ; psnr std = {np.std(psnrs):.2f}")
        print(msg)
        with open(os.path.join(evaldir, "psnr.txt"), "w") as f:
            f.write(msg + "\n")


def _render_only_cam(args, cfg, params, evaldir):
    """Free-viewpoint rendering from a cameras-only npz (the reference's
    IDR_ONLY_CAM dataset mode, scene_dataset.py:26-56)."""
    import jax.numpy as jnp
    from PIL import Image
    from ..geometry.cameras import decompose_projection
    from ..rendering import render_forward

    H, W = (int(v) for v in args.only_cam_size.split(","))
    cams = np.load(args.only_cam)
    n = len([k for k in cams.files if k.startswith("world_mat_")])
    out_dir = os.path.join(evaldir, "rendering2")
    os.makedirs(out_dir, exist_ok=True)
    uv = np.stack(np.meshgrid(np.arange(W), np.arange(H)),
                  -1).reshape(-1, 2).astype(np.float32)
    import jax
    chunk = min(args.chunk_pixels, H * W)

    n_chunks = -(-H * W // chunk)
    sel_all = np.concatenate(
        [np.arange(H * W), np.zeros(n_chunks * chunk - H * W, np.int64)]
    ).reshape(n_chunks, chunk)
    uv_chunks = jnp.asarray(uv[sel_all])
    mask_chunks = jnp.ones((n_chunks, chunk), bool)

    # host-looped chunk dispatches (an outer lax.map over >1 chunks
    # crashes the TPU compiler — see the eval_rendering path)
    @jax.jit
    def _render_chunk(p, uv1, m1, intr, pose):
        inputs = {"uv": uv1[None], "intrinsics": intr[None],
                  "pose": pose[None], "object_mask": m1[None]}
        return render_forward(cfg.model, p, inputs,
                              training=False).rgb_values[0]

    for i in range(n):
        P = (cams[f"world_mat_{i}"] @ cams[f"scale_mat_{i}"])[:3, :4]
        intr, pose = decompose_projection(P)
        intr_d, pose_d = jnp.asarray(intr), jnp.asarray(pose)
        out = np.concatenate(
            [np.asarray(_render_chunk(params, uv_chunks[c], mask_chunks[c],
                                      intr_d, pose_d))
             for c in range(n_chunks)])
        rgb = (out.reshape(-1, 3)[:H * W]
               .reshape(H, W, 3) + 1) / 2
        Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"eval_{i:03d}.png"))
    print(f"rendered {n} free viewpoints -> {out_dir}")


if __name__ == "__main__":
    main()

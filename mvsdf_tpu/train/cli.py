"""Training CLI.

Usage parity with the reference (``code/training/exp_runner.py:10-19``):
    python -m mvsdf_tpu.train.cli --data_dir DATA --batch_size 8 \
        --nepoch 1800 --expname NAME [--is_continue]
"""
from __future__ import annotations

import argparse
import os
from datetime import datetime

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="mvsdf-tpu per-scene training")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--nepoch", type=int, default=1800)
    ap.add_argument("--num_pixels", type=int, default=4096)
    ap.add_argument("--expname", default="mvsdf")
    ap.add_argument("--exps_folder", default="exps")
    ap.add_argument("--is_continue", action="store_true")
    ap.add_argument("--timestamp", default="latest")
    ap.add_argument("--checkpoint", default="latest",
                    help="epoch to resume from with --is_continue "
                         "(default: latest)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no_mesh", action="store_true",
                    help="disable multi-device sharding")
    ap.add_argument("--train_cameras", action="store_true",
                    help="jointly optimize per-image camera poses")
    ap.add_argument("--matmul_precision", default="default",
                    choices=["default", "tensorfloat32", "highest"],
                    help="XLA matmul precision; 'default' (bf16 inputs, "
                         "f32 accumulate) matches tf32 quality on the "
                         "600-epoch study (PERF.md) at +9%% throughput")
    ap.add_argument("--conf", default="",
                    help="HOCON config (reference mvsdf_dtu.conf format); "
                         "defaults to the built-in full-size architecture")
    ap.add_argument("--platform", default="",
                    help="force a jax platform (e.g. cpu); needed on hosts "
                         "whose sitecustomize pre-pins the TPU backend")
    ap.add_argument("--no_fused", action="store_true",
                    help="disable the fused multi-epoch dispatch (device-"
                         "resident scene cache + lax.scan); falls back to "
                         "the reference-shaped per-epoch host loop")
    ap.add_argument("--epochs_per_dispatch", type=int, default=16)
    ap.add_argument("--profile_dir", default="",
                    help="capture a jax.profiler trace of the first "
                         "--profile_epochs epochs into this directory")
    ap.add_argument("--profile_epochs", type=int, default=0)
    ap.add_argument("--pallas", action="store_true",
                    help="fused Pallas SDF kernels for the no-grad trace "
                         "plus fallback-stage compaction (single-process; "
                         "TPU only). The supervised re-evaluation stays "
                         "full-f32 either way.")
    ap.add_argument("--bf16_acts", action="store_true",
                    help="bf16 activation storage in the supervised "
                         "implicit MLP (bf16 multiply / f32 accumulate "
                         "like DEFAULT matmul precision; ~6%% faster "
                         "steps; 600-epoch study: PSNR 23.0 vs 22.91, "
                         "chamfer 0.0105 vs 0.0097 — see PERF.md)")
    ap.add_argument("--keep_fill", action="store_true",
                    help="keep the reference's training-mode min-SDF miss "
                         "fill (ref ray_tracing.py:86-94). Its outputs are "
                         "dead in the training step (losses+gradients are "
                         "bit-identical without it — see "
                         "TracerConfig.fill_misses), so it is skipped by "
                         "default")
    ap.add_argument("--no_supervised_compact", action="store_true",
                    help="force the supervised path dense even when the "
                         "sphere-intersect bound would engage "
                         "auto_supervised_cascade (A/B arm for the "
                         "win-regime validation, PERF.md round 4)")
    ap.add_argument("--allow_random_features", action="store_true",
                    help="proceed with RANDOM FeatExt CNN weights when the "
                         "pretrained VisMVSNet checkpoint "
                         "(MVSDF_VISMVSNET_PT) is absent — synthetic "
                         "bring-up scenes only; on real imagery the "
                         "feature-consistency loss would supervise noise")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    from ..compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import dataclasses
    from ..config import MVSDFConfig, TrainConfig
    from ..data.scene import SceneData
    from .loop import Trainer

    if args.conf:
        from ..hocon import config_from_hocon
        cfg = config_from_hocon(args.conf)
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, batch_size=args.batch_size,
            num_pixels=args.num_pixels, nepochs=args.nepoch,
            seed=args.seed, train_cameras=args.train_cameras,
            fused_dispatch=not args.no_fused,
            epochs_per_dispatch=args.epochs_per_dispatch))
    else:
        cfg = MVSDFConfig(train=TrainConfig(
            batch_size=args.batch_size, num_pixels=args.num_pixels,
            nepochs=args.nepoch, seed=args.seed,
            train_cameras=args.train_cameras,
            fused_dispatch=not args.no_fused,
            epochs_per_dispatch=args.epochs_per_dispatch))

    exp_base = os.path.join(args.exps_folder, args.expname)
    if args.is_continue and args.timestamp == "latest" and \
            os.path.isdir(exp_base):
        stamps = sorted(os.listdir(exp_base))
        stamp = stamps[-1] if stamps else datetime.now().strftime(
            "%Y_%m_%d_%H_%M_%S")
    elif args.is_continue:
        stamp = args.timestamp
    else:
        stamp = datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    exp_dir = os.path.join(exp_base, stamp)
    os.makedirs(exp_dir, exist_ok=True)

    scene = SceneData(args.data_dir,
                      allow_random_features=args.allow_random_features)

    if args.bf16_acts:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, implicit=dataclasses.replace(
                cfg.model.implicit, bf16_activations=True)))

    if not args.keep_fill:
        # Skip the training-mode min-SDF miss fill: its outputs are dead in
        # the training step (TracerConfig.fill_misses docstring has the
        # proof; losses+gradients bit-identical, tested). On masked scenes
        # it is most of the fallback work.
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, tracer=dataclasses.replace(
                cfg.model.tracer, fill_misses=False)))

    if args.pallas:
        # Fused Pallas SDF kernels + unified-fallback compaction. The
        # capacity is sized from the scene's mask statistics: every
        # out-of-mask ray takes the fallback (ref ray_tracing.py:86-94),
        # so a capacity below (1 - object_frac) would hit the dense
        # overflow branch every step. Per-device-legal under
        # shard_map_trace on a mesh; plain single-chip otherwise.
        from ..tracing.sphere_trace import (auto_fallback_cascade,
                                            auto_march_schedule,
                                            auto_supervised_cascade,
                                            ray_intersect_fraction)
        obj_frac = float(np.mean(scene.masks))
        uv_all = np.broadcast_to(scene.uv[None], (scene.n_images,) +
                                 scene.uv.shape)
        isect = ray_intersect_fraction(uv_all, scene.intrinsics,
                                       scene.poses)
        cap = auto_fallback_cascade(obj_frac, intersect_frac=isect,
                                    fill_misses=args.keep_fill)
        march_sched = auto_march_schedule(obj_frac, intersect_frac=isect)
        # the supervised gather crosses ray-shard boundaries, so it is a
        # single-device optimization (the trace compaction runs per-device
        # under shard_map instead)
        sup = auto_supervised_cascade(intersect_frac=isect) \
            if len(jax.devices()) == 1 else ()
        if args.no_supervised_compact:
            sup = ()
        print(f"fallback capacity cascade: {cap}, march schedule "
              f"{march_sched}, supervised cascade {sup} "
              f"(object mask frac {obj_frac:.3f}, "
              f"sphere-intersect frac {isect:.3f})")
        tr = dataclasses.replace(cfg.model.tracer,
                                 sampler_capacity_frac=0.25,
                                 fill_capacity_frac=0.5,
                                 fallback_capacity_frac=cap,
                                 march_compact_schedule=march_sched)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, use_pallas_trace=True, shard_map_trace=True,
            supervised_compact_frac=sup,
            # Mosaic kernels need the TPU backend; on cpu (smoke runs)
            # fall back to interpret mode
            pallas_interpret=jax.devices()[0].platform == "cpu",
            tracer=tr))

    trainer = Trainer(cfg, scene, exp_dir, use_mesh=not args.no_mesh,
                      profile_dir=args.profile_dir or None,
                      profile_epochs=args.profile_epochs)
    resume_step = (None if args.checkpoint == "latest"
                   else int(args.checkpoint))
    trainer.run(resume=args.is_continue, resume_step=resume_step)


if __name__ == "__main__":
    main()

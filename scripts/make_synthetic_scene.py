"""Write a synthetic DTU-analog scene to disk in the reference dataset
layout (image_hd/, mask_hd/, depth/*.pfm, cameras_hd.npz, ../pair.txt,
../cam_*_flow3.txt): a textured lambertian sphere over a checkered ground
plane, viewed by frontal-cap cameras with analytic depth maps.

Useful as an end-to-end CLI test bed and as a template for BYOD.

    python scripts/make_synthetic_scene.py --out DATA/synth --views 12
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mvsdf_tpu.data import formats  # noqa: E402
from tests.golden.scene_fixtures import (  # noqa: E402
    look_at_extrinsic, render_shaded_sphere)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True,
                    help="scene directory (parent gets pair.txt + cams)")
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--img_hw", type=int, default=128)
    ap.add_argument("--depth_hw", type=int, default=64)
    ap.add_argument("--radius", type=float, default=0.45)
    ap.add_argument("--focal_mult", type=float, default=1.3,
                    help="focal = focal_mult * img_hw; lower = wider FoV "
                         "(drops the sphere-intersect fraction — the "
                         "supervised-compaction win regime needs < 0.5)")
    ap.add_argument("--plane_r", type=float, default=0.92,
                    help="ground-plane radius; 0 disables the plane "
                         "(mask-tight object-only scene)")
    ap.add_argument("--dist", type=float, default=2.2,
                    help="camera distance from the origin")
    args = ap.parse_args()

    import imageio.v2 as imageio

    out = os.path.abspath(args.out)
    parent = os.path.dirname(out)
    for sub in ("image_hd", "mask_hd", "depth"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)

    n = args.views
    H = W = args.img_hw
    h = w = args.depth_hw
    f_hd = args.focal_mult * H
    K = np.array([[f_hd, 0, W / 2], [0, f_hd, H / 2], [0, 0, 1.0]])
    Kd = K.copy()
    Kd[:2] *= h / H

    golden = np.pi * (3 - np.sqrt(5))
    elev = np.deg2rad(np.linspace(20, 65, n))
    azim = golden * np.arange(n)
    cam_pos = args.dist * np.stack([np.cos(elev) * np.cos(azim),
                                    np.sin(elev),
                                    np.cos(elev) * np.sin(azim)], -1)

    cam_npz = {}
    pair = {"id_list": [str(i) for i in range(n)]}
    for i in range(n):
        extr = look_at_extrinsic(cam_pos[i])
        rgb, _, mask = render_shaded_sphere(cam_pos[i], extr, K, H,
                                            args.radius,
                                            plane_r=args.plane_r)
        _, depth, _ = render_shaded_sphere(cam_pos[i], extr, Kd, h,
                                           args.radius,
                                           plane_r=args.plane_r)
        img8 = ((rgb / 2 + 0.5) * 255).clip(0, 255).astype(np.uint8)
        imageio.imwrite(os.path.join(out, "image_hd", f"{i:03}.png"), img8)
        imageio.imwrite(os.path.join(out, "mask_hd", f"{i:03}.png"),
                        (mask * 255).astype(np.uint8))
        formats.write_pfm(os.path.join(out, "depth", f"{i:03}.pfm"),
                          depth.astype(np.float32))

        P = np.zeros((4, 4), np.float32)
        P[:3] = K @ extr[:3]
        P[3, 3] = 1
        cam_npz[f"world_mat_{i}"] = P
        cam_npz[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)

        cam = np.zeros((2, 4, 4))
        cam[0] = extr
        cam[1][:3, :3] = Kd
        cam[1][3] = [1.0, 0.01, 256, 1.0 + 0.01 * 255]
        formats.write_cam(
            os.path.join(parent, f"cam_{i:08}_flow3.txt"), cam)

        d = np.linalg.norm(cam_pos - cam_pos[i], axis=1)
        d[i] = np.inf
        srcs = np.argsort(d)[:2]
        pair[str(i)] = {"id": str(i), "index": i,
                        "pair": [str(j) for j in srcs],
                        "score": [float(10 - k) for k in range(len(srcs))]}

    np.savez(os.path.join(out, "cameras_hd.npz"), **cam_npz)
    formats.write_pair(os.path.join(parent, "pair.txt"), pair)
    print(f"wrote {n} views to {out} (images {H}x{W}, depths {h}x{w})")


if __name__ == "__main__":
    main()

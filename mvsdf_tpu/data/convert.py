"""Vis-MVSNet output -> MVSDF dataset layout converter.

Behavioral parity target: ``code/datasets/vismvsnet2mvsdf.py`` (127 LoC):
probability-thresholded depth masks, scene bounding box from the fused+cut
point cloud (cut.ply) or camera frusta, cropped/resized image_hd/, mask_hd/,
masked depth/*.pfm, and cameras_hd.npz with world_mat = K.E and scale_mat =
(size/2, center).

CLI: python -m mvsdf_tpu.data.convert --data_dir VIS_OUT --out_dir SCENE \
        [--pthresh 0.8,0.7,0.8] [--size factor]
"""
from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np

from . import formats


def load_ply_points(path: str) -> np.ndarray:
    """Minimal PLY reader (ascii or binary_little_endian, x/y/z floats)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l for l in header if l.startswith("format")).split()[1]
        n = int(next(l for l in header if l.startswith("element vertex"))
                .split()[-1])
        props = [l.split() for l in header if l.startswith("property")
                 and not l.startswith("property list")]
        names = [p[2] for p in props]
        type_map = {"float": "f4", "float32": "f4", "double": "f8",
                    "uchar": "u1", "uint8": "u1", "int": "i4",
                    "uint": "u4", "short": "i2", "ushort": "u2"}
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n)
            xyz = data[:, [names.index("x"), names.index("y"),
                           names.index("z")]]
        else:
            dt = np.dtype([(nm, "<" + type_map[p[1]])
                           for nm, p in zip(names, props)])
            data = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)
            xyz = np.stack([data["x"], data["y"], data["z"]], -1)
    return np.asarray(xyz, np.float64)


def scene_bbox_from_points(pts: np.ndarray, perc: float = 1.0):
    lo = np.percentile(pts, 100 - 100 * perc, axis=0)
    hi = np.percentile(pts, 100 * perc, axis=0)
    center = (lo + hi) / 2
    size = float((hi - lo).max())
    return center, size


def scene_bbox_from_cams(cams, depth_range=(0.3, 0.9)):
    """Fallback bbox from camera frusta mid-depth points."""
    pts = []
    for cam in cams:
        E = cam[0]
        R = E[:3, :3]
        t = E[:3, 3]
        c = -R.T @ t
        z = R.T @ np.array([0, 0, 1.0])
        d0, d1 = cam[1][3][0], cam[1][3][3]
        if d1 <= 0:
            d0, d1 = 0.5, 2.0
        for a in depth_range:
            pts.append(c + z * (d0 + a * (d1 - d0)))
    return scene_bbox_from_points(np.asarray(pts))


def convert(data_dir: str, out_dir: str, pthresh=(0.8, 0.7, 0.8),
            max_d: int = 256):
    """data_dir: Vis-MVSNet output with {%08d.jpg|png images, cam_%08d_flow3
    .txt, %08d_flow3.pfm depths, %08d_flow{1,2,3}_prob.pfm, pair.txt,
    optionally cut.ply}."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "image_hd"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask_hd"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)

    pair = formats.load_pair(os.path.join(data_dir, "pair.txt"))
    ids = pair["id_list"]

    cams = [formats.load_cam(
        os.path.join(data_dir, f"cam_{i.zfill(8)}_flow3.txt"), max_d)
        for i in ids]

    cut_ply = os.path.join(data_dir, "cut.ply")
    if os.path.exists(cut_ply):
        center, size = scene_bbox_from_points(load_ply_points(cut_ply),
                                              perc=0.99)
    else:
        center, size = scene_bbox_from_cams(cams)

    cam_dict = {}
    for k, img_id in enumerate(ids):
        stem = img_id.zfill(8)
        img_path = None
        for ext in (".jpg", ".png"):
            p = os.path.join(data_dir, stem + ext)
            if os.path.exists(p):
                img_path = p
                break
        if img_path is None:
            raise FileNotFoundError(f"image for id {img_id}")
        img = cv2.imread(img_path)

        depth = formats.load_pfm(
            os.path.join(data_dir, f"{stem}_flow3.pfm"))
        # probability-threshold masks at 3 scales (ref :51-57)
        mask = np.ones_like(depth, bool)
        for scale_i, th in enumerate(pthresh):
            pp = os.path.join(data_dir, f"{stem}_flow{scale_i + 1}_prob.pfm")
            if os.path.exists(pp):
                prob = formats.load_pfm(pp)
                if prob.shape != depth.shape:
                    prob = cv2.resize(prob, depth.shape[::-1],
                                      interpolation=cv2.INTER_LINEAR)
                mask &= prob > th
        depth_masked = depth * mask

        h, w = depth.shape
        H, W = h * 2, w * 2
        img_hd = cv2.resize(img, (W, H), interpolation=cv2.INTER_LINEAR)
        cv2.imwrite(os.path.join(out_dir, "image_hd", f"{k:03}.png"),
                    img_hd)
        cv2.imwrite(os.path.join(out_dir, "mask_hd", f"{k:03}.png"),
                    np.full((H, W), 255, np.uint8))
        formats.write_pfm(os.path.join(out_dir, "depth", f"{k:03}.pfm"),
                          depth_masked.astype(np.float32))

        cam = cams[k]
        # world_mat at image_hd resolution: scale intrinsics to 2x depth res
        K = cam[1][:3, :3].copy() * 1.0
        K[:2] *= 2
        P = np.zeros((4, 4))
        P[:3] = K @ cam[0][:3]
        P[3, 3] = 1
        scale_mat = np.eye(4)
        scale_mat[0, 0] = scale_mat[1, 1] = scale_mat[2, 2] = size / 2
        scale_mat[:3, 3] = center
        cam_dict[f"world_mat_{k}"] = P.astype(np.float32)
        cam_dict[f"scale_mat_{k}"] = scale_mat.astype(np.float32)

    np.savez(os.path.join(out_dir, "cameras_hd.npz"), **cam_dict)
    # pair + cams are consumed from the parent dir (ref scene_dataset layout)
    parent = os.path.dirname(os.path.abspath(out_dir))
    formats.write_pair(os.path.join(parent, "pair.txt"), pair)
    for img_id, cam in zip(ids, cams):
        formats.write_cam(
            os.path.join(parent, f"cam_{img_id.zfill(8)}_flow3.txt"), cam)
    print(f"converted {len(ids)} views -> {out_dir} "
          f"(center={center}, size={size:.3f})")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--pthresh", default="0.8,0.7,0.8")
    args = ap.parse_args(argv)
    convert(args.data_dir, args.out_dir,
            tuple(float(x) for x in args.pthresh.split(",")))


if __name__ == "__main__":
    main()

"""End-to-end test of the Vis-MVSNet -> MVSDF dataset converter
(mvsdf_tpu/data/convert.py; behavioral parity target ref
code/datasets/vismvsnet2mvsdf.py): builds a synthetic Vis-MVSNet output
directory, converts it, and checks the produced reference-layout scene —
probability-masked depths, world_mat = K(2x) . E, scale_mat from the
cut.ply bbox — loads through SceneData."""
import os

import numpy as np
import pytest

from mvsdf_tpu.data import formats
from mvsdf_tpu.data.convert import convert, load_ply_points
from mvsdf_tpu.geometry.cameras import decompose_projection


def _make_vis_out(root, n_views=3, hw=16):
    cv2 = pytest.importorskip("cv2")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    ids = [str(i) for i in range(n_views)]
    pair = {"id_list": ids}
    for i in ids:
        srcs = [j for j in ids if j != i]
        pair[i] = {"id": i, "index": int(i), "pair": srcs,
                   "score": [100.0 - 10 * k for k in range(len(srcs))]}
    formats.write_pair(os.path.join(root, "pair.txt"), pair)
    cams = []
    for k in range(n_views):
        ang = 2 * np.pi * k / n_views
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        c = -R.T @ np.array([0, 0, 2.5])  # camera 2.5 from origin
        E = np.eye(4)
        E[:3, :3] = R
        E[:3, 3] = -R @ c
        K = np.array([[hw * 1.2, 0, hw / 2, 0],
                      [0, hw * 1.2, hw / 2, 0],
                      [0, 0, 1, 0],
                      [1.0, 0.01, 256, 3.0]])  # depth min/interval/num/max
        cam = np.stack([E, K])
        cams.append(cam)
        formats.write_cam(os.path.join(root, f"cam_{str(k).zfill(8)}"
                                             f"_flow3.txt"), cam)
        img = (rng.uniform(0, 255, (hw * 4, hw * 4, 3))).astype(np.uint8)
        cv2.imwrite(os.path.join(root, f"{str(k).zfill(8)}.jpg"), img)
        depth = rng.uniform(2.0, 3.0, (hw, hw)).astype(np.float32)
        formats.write_pfm(os.path.join(root, f"{str(k).zfill(8)}"
                                             f"_flow3.pfm"), depth)
        # probability maps: view 0 gets a low-prob left half at scale 3
        for s in (1, 2, 3):
            prob = np.full((hw, hw), 0.9, np.float32)
            if k == 0 and s == 3:
                prob[:, :hw // 2] = 0.1
            formats.write_pfm(os.path.join(
                root, f"{str(k).zfill(8)}_flow{s}_prob.pfm"), prob)
    # cut.ply: points in a known box around the origin
    pts = rng.uniform(-0.5, 0.5, (500, 3))
    with open(os.path.join(root, "cut.ply"), "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex %d\n" % len(pts))
        f.write("property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        np.savetxt(f, pts, fmt="%.6f")
    return cams, pts


def test_convert_end_to_end(tmp_path):
    vis = str(tmp_path / "vis")
    out = str(tmp_path / "scan" / "imfunc4")
    os.makedirs(str(tmp_path / "scan"), exist_ok=True)
    cams, pts = _make_vis_out(vis)
    convert(vis, out)

    # layout
    assert os.path.exists(os.path.join(out, "cameras_hd.npz"))
    assert os.path.exists(os.path.join(str(tmp_path / "scan"), "pair.txt"))
    assert os.path.exists(os.path.join(str(tmp_path / "scan"),
                                       "cam_00000000_flow3.txt"))
    assert len(os.listdir(os.path.join(out, "image_hd"))) == 3

    # depth masking: view 0's left half was below the flow3 prob threshold
    d0 = formats.load_pfm(os.path.join(out, "depth", "000.pfm"))
    assert np.all(d0[:, :d0.shape[1] // 2] == 0)
    assert np.all(d0[:, d0.shape[1] // 2:] > 0)
    d1 = formats.load_pfm(os.path.join(out, "depth", "001.pfm"))
    assert np.all(d1 > 0)

    cam_dict = np.load(os.path.join(out, "cameras_hd.npz"))
    # scale_mat from the cut.ply bbox (99th-percentile box around origin)
    S = cam_dict["scale_mat_0"]
    lo = np.percentile(pts, 1, axis=0)
    hi = np.percentile(pts, 99, axis=0)
    assert np.allclose(np.diag(S)[:3], (hi - lo).max() / 2, atol=1e-6)
    assert np.allclose(S[:3, 3], (lo + hi) / 2, atol=1e-6)

    # world_mat decomposes back to the source camera: same center, and
    # intrinsics at 2x the depth resolution
    for k in range(3):
        P = cam_dict[f"world_mat_{k}"]
        intr, pose = decompose_projection(P[:3, :4])
        E = cams[k][0]
        c_gt = -E[:3, :3].T @ E[:3, 3]
        assert np.allclose(pose[:3, 3], c_gt, atol=1e-4)
        assert np.allclose(intr[0, 0], cams[k][1][0, 0] * 2, rtol=1e-5)

    # the converted scene loads through the real dataset layer
    from mvsdf_tpu.data.scene import SceneData
    scene = SceneData(out, allow_random_features=True)
    assert scene.n_images == 3
    assert scene.depths.shape[0] == 3
    # depth maps in SceneData are the masked ones ((n, sel_depth, H, W))
    assert np.all(np.asarray(scene.depths[0, 0])[:, :d0.shape[1] // 2] == 0)
    assert np.all(np.asarray(scene.depths[0, 0])[:, d0.shape[1] // 2:] > 0)

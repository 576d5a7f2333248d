import os
import numpy as np
import pytest

from mvsdf_tpu.data import formats
from mvsdf_tpu.geometry.cameras import decompose_projection


def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(0).normal(size=(17, 23)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    formats.write_pfm(p, img)
    back = formats.load_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_pfm_color_roundtrip(tmp_path):
    img = np.random.default_rng(1).normal(size=(9, 7, 3)).astype(np.float32)
    p = str(tmp_path / "c.pfm")
    formats.write_pfm(p, img)
    np.testing.assert_array_equal(formats.load_pfm(p), img)


def test_cam_roundtrip(tmp_path):
    cam = np.zeros((2, 4, 4))
    cam[0] = np.arange(16).reshape(4, 4)
    cam[1][:3, :3] = [[500, 0, 320], [0, 510, 240], [0, 0, 1]]
    cam[1][3] = [425.0, 2.5, 256, 425.0 + 2.5 * 255]
    p = str(tmp_path / "cam.txt")
    formats.write_cam(p, cam)
    back = formats.load_cam(p, max_d=256)
    np.testing.assert_allclose(back, cam)


def test_pair_roundtrip(tmp_path):
    pair = {"id_list": ["0", "5"],
            "0": {"id": "0", "index": 0, "pair": ["5", "7"],
                  "score": [10.0, 3.0]},
            "5": {"id": "5", "index": 1, "pair": ["0"], "score": [9.0]}}
    p = str(tmp_path / "pair.txt")
    formats.write_pair(p, pair)
    back = formats.load_pair(p)
    assert back["id_list"] == ["0", "5"]
    assert back["0"]["pair"] == ["5", "7"]
    assert back["5"]["score"] == [9.0]


def test_decompose_projection_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    for _ in range(5):
        K = np.array([[500.0, 2.0, 320], [0, 510, 240], [0, 0, 1]])
        # random rotation via QR
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q = -Q
        t = rng.normal(size=(3,))
        P = K @ np.concatenate([Q, t[:, None]], 1)
        intr, pose = decompose_projection(P)
        out = cv2.decomposeProjectionMatrix(P)
        K_cv = out[0] / out[0][2, 2]
        np.testing.assert_allclose(intr[:3, :3], K_cv, atol=1e-4)
        np.testing.assert_allclose(pose[:3, :3], out[1].T, atol=1e-6)
        c_cv = (out[2][:3] / out[2][3]).ravel()
        np.testing.assert_allclose(pose[:3, 3], c_cv, atol=1e-5)


def test_decompose_projection_recovers_pose():
    rng = np.random.default_rng(3)
    K = np.array([[600.0, 0, 400], [0, 600, 300], [0, 0, 1]])
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q = -Q
    c = rng.normal(size=(3,)) * 2
    t = -Q @ c
    P = K @ np.concatenate([Q, t[:, None]], 1)
    intr, pose = decompose_projection(P)
    np.testing.assert_allclose(intr[:3, :3], K, atol=1e-4)
    np.testing.assert_allclose(pose[:3, :3], Q.T, atol=1e-6)
    np.testing.assert_allclose(pose[:3, 3], c, atol=1e-6)

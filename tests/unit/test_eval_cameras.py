import numpy as np

from mvsdf_tpu.eval.cameras import (align_rotations, umeyama,
                                    rotation_errors_deg, camera_accuracy)


def _rand_rot(rng):
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q = -Q
    return Q


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(20, 3))
    R = _rand_rot(rng)
    c, t = 1.7, np.array([0.3, -1.0, 2.0])
    dst = c * src @ R.T + t
    c2, R2, t2 = umeyama(src, dst)
    assert abs(c2 - c) < 1e-6
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_camera_accuracy_zero_when_aligned():
    rng = np.random.default_rng(1)
    n = 8
    gt_Rs = np.stack([_rand_rot(rng) for _ in range(n)])
    gt_ts = rng.normal(size=(n, 3))
    G = _rand_rot(rng)
    pred_Rs = np.einsum("ij,njk->nik", G.T, gt_Rs)
    pred_ts = (gt_ts - 0.5) @ G / 2.0  # scaled+rotated+shifted
    res = camera_accuracy(pred_Rs, pred_ts, gt_Rs, gt_ts)
    assert res["R_errors_deg"].max() < 1e-3
    assert res["t_errors"].max() < 1e-5


def test_rotation_errors():
    rng = np.random.default_rng(2)
    R = np.stack([_rand_rot(rng)])
    assert rotation_errors_deg(R, R)[0] < 1e-3
    # 90 deg rotation about z
    Rz = np.array([[[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]])
    I = np.eye(3)[None]
    assert abs(rotation_errors_deg(Rz, I)[0] - 90) < 1e-5

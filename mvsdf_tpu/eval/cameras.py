"""Camera-accuracy evaluation: align predicted poses to ground truth by a
similarity transform and report rotation/translation errors.

Behavioral parity target: ``code/evaluation/eval.py:188-246``
(get_cameras_accuracy + compare_rotations). The reference solves the
translation/scale fit with cvxpy; the same least-squares problem
(min ||c R p_i + t - g_i||) has a closed form (Umeyama alignment), used here.
"""
from __future__ import annotations

import numpy as np


def align_rotations(pred_Rs: np.ndarray, gt_Rs: np.ndarray) -> np.ndarray:
    """Best global rotation R_opt minimizing sum ||R_opt pred_R - gt_R||_F
    via SVD (ref eval.py:196-205)."""
    M = np.einsum("nij,nkj->ik", gt_Rs, pred_Rs)  # sum gt @ pred^T
    U, _, Vt = np.linalg.svd(M)
    D = np.eye(3)
    D[2, 2] = np.linalg.det(U @ Vt)
    return U @ D @ Vt


def umeyama(src: np.ndarray, dst: np.ndarray):
    """Similarity transform (c, R, t) minimizing ||c R src + t - dst||^2."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    U, S, Vt = np.linalg.svd(cov)
    D = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        D[2, 2] = -1
    R = U @ D @ Vt
    var_s = (sc ** 2).sum() / len(src)
    c = np.trace(np.diag(S) @ D) / var_s
    t = mu_d - c * R @ mu_s
    return c, R, t


def rotation_errors_deg(R1: np.ndarray, R2: np.ndarray) -> np.ndarray:
    """Per-pair geodesic rotation error in degrees (ref eval.py:233-237)."""
    cos_err = (np.einsum("nij,nij->n", R1, R2) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos_err, -1, 1)))


def camera_accuracy(pred_Rs, pred_ts, gt_Rs, gt_ts):
    """Align predicted cameras to GT; returns dict with the aligned
    similarity and per-camera errors (ref get_cameras_accuracy)."""
    pred_Rs = np.asarray(pred_Rs)
    gt_Rs = np.asarray(gt_Rs)
    R_opt = align_rotations(pred_Rs, gt_Rs)
    R_fixed = np.einsum("ij,njk->nik", R_opt, pred_Rs)
    c, R_align, t = umeyama(np.asarray(pred_ts), np.asarray(gt_ts))
    t_fixed = (c * np.einsum("ij,nj->ni", R_align, np.asarray(pred_ts)) + t)
    return {
        "R_opt": R_opt, "scale": c, "t_opt": t,
        "R_errors_deg": rotation_errors_deg(R_fixed, gt_Rs),
        "t_errors": np.linalg.norm(t_fixed - np.asarray(gt_ts), axis=-1),
    }

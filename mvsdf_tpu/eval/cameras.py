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


def _fit_scale_shift_sum_of_norms(p, g, iters=200, tol=1e-12):
    """min_{c,t} sum_i ||g_i - (c p_i + t)||_2 — the reference solves this
    with cvxpy (eval.py:206-212); same objective here via IRLS (iterated
    reweighted least squares, Weiszfeld-style). Converges to the convex
    optimum; closed-form LS is the first iterate."""
    w = np.ones(len(p))
    c, t = 1.0, np.zeros(p.shape[1])
    for _ in range(iters):
        W = w / w.sum()
        mp = W @ p
        mg = W @ g
        pc = p - mp
        gc = g - mg
        c_new = (W * np.einsum("ni,ni->n", gc, pc)).sum() / max(
            (W * np.einsum("ni,ni->n", pc, pc)).sum(), 1e-30)
        t_new = mg - c_new * mp
        if abs(c_new - c) < tol and np.abs(t_new - t).max() < tol:
            c, t = c_new, t_new
            break
        c, t = c_new, t_new
        r = np.linalg.norm(g - (c * p + t), axis=1)
        w = 1.0 / np.maximum(r, 1e-9)
    return c, t


def camera_accuracy(pred_Rs, pred_ts, gt_Rs, gt_ts):
    """Align predicted cameras to GT; returns dict with the aligned
    similarity and per-camera errors.

    Structure matches the reference ``get_cameras_accuracy``
    (eval.py:188-232): global R_opt from rotation alignment, predicted
    translations rotated by R_opt, then a robust (sum-of-norms) scale+shift
    fit — IRLS instead of cvxpy."""
    pred_Rs = np.asarray(pred_Rs)
    gt_Rs = np.asarray(gt_Rs)
    gt_ts = np.asarray(gt_ts)
    R_opt = align_rotations(pred_Rs, gt_Rs)
    R_fixed = np.einsum("ij,njk->nik", R_opt, pred_Rs)
    p = np.einsum("ij,nj->ni", R_opt, np.asarray(pred_ts))
    c, t = _fit_scale_shift_sum_of_norms(p, gt_ts)
    t_fixed = c * p + t
    return {
        "R_opt": R_opt, "scale": c, "t_opt": t,
        "R_errors_deg": rotation_errors_deg(R_fixed, gt_Rs),
        "t_errors": np.linalg.norm(t_fixed - gt_ts, axis=-1),
    }

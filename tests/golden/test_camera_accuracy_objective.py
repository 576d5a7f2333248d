"""Golden verification of the eval camera-accuracy path (VERDICT r3 #5).

The reference (``code/evaluation/eval.py:188-231`` get_cameras_accuracy)
aligns predicted to GT cameras by (a) a global SVD rotation fit and (b) a
cvxpy sum-of-norms scale+shift fit:

    min_{c,t}  sum_i || gt_i - (c p_i + t) ||_2          (eval.py:206-212)

cvxpy is not installed here, so ``eval/cameras.py`` solves the SAME convex
objective with Weiszfeld-style IRLS. These tests certify that substitution:
the objective is implemented directly (it is 3 lines of numpy), and the
IRLS fixed point is checked to attain its global optimum — by convexity,
no descent direction may exist at the solution, and scipy's generic
minimizer must not find a lower value. A closed-form case (exact fit,
plus a geometric-median outlier case) pins the answer analytically.

The rotation stage is checked against an independent double-precision
re-derivation of the reference's formula (addbmm + SVD + det correction,
eval.py:196-202) and against its defining property (global minimizer of
sum ||R q_i - g_i||_F^2 over SO(3)).
"""
import numpy as np
import pytest

from mvsdf_tpu.eval.cameras import (_fit_scale_shift_sum_of_norms,
                                    align_rotations, camera_accuracy)


def _objective(c, t, p, g):
    """The reference's cvxpy objective, verbatim (eval.py:206-212)."""
    return np.linalg.norm(g - (c * p + t), axis=1).sum()


def _rand_rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("outliers", [0, 2])
def test_irls_attains_convex_optimum(seed, outliers):
    """No perturbation of the IRLS (c, t) may lower the convex objective,
    and scipy's generic minimizer (multi-start) must not beat it."""
    rng = np.random.default_rng(seed)
    n = 12
    p = rng.normal(size=(n, 3)) * 2.0
    c_true, t_true = 1.7, np.array([0.3, -1.1, 0.6])
    g = c_true * p + t_true + 0.05 * rng.normal(size=(n, 3))
    if outliers:
        g[:outliers] += rng.normal(size=(outliers, 3)) * 3.0  # sum-of-norms
        # departs from least squares exactly when outliers exist

    c, t = _fit_scale_shift_sum_of_norms(p, g)
    f_star = _objective(c, t, p, g)

    # convexity: check no descent along random directions at several radii
    for _ in range(200):
        d = rng.normal(size=4)
        d /= np.linalg.norm(d)
        for r in (1e-4, 1e-3, 1e-2):
            f_pert = _objective(c + r * d[0], t + r * d[1:], p, g)
            assert f_pert >= f_star - 1e-9, (
                f"descent direction exists: {f_pert} < {f_star}")

    # scipy multi-start must not find better (within its own tolerance)
    from scipy.optimize import minimize
    for x0 in (np.array([1.0, 0, 0, 0]),
               np.concatenate([[c], t]),
               rng.normal(size=4)):
        res = minimize(lambda x: _objective(x[0], x[1:], p, g), x0,
                       method="Nelder-Mead",
                       options={"xatol": 1e-10, "fatol": 1e-12,
                                "maxiter": 20000})
        assert f_star <= res.fun + 1e-6, \
            f"scipy found lower objective: {res.fun} < {f_star}"


def test_exact_fit_closed_form():
    """g = c* p + t* exactly -> the optimum is 0 and recovers (c*, t*)."""
    rng = np.random.default_rng(7)
    p = rng.normal(size=(10, 3))
    c_true, t_true = 0.83, np.array([1.0, -0.5, 2.0])
    g = c_true * p + t_true
    c, t = _fit_scale_shift_sum_of_norms(p, g)
    assert abs(c - c_true) < 1e-8
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    assert _objective(c, t, p, g) < 1e-7


def test_outlier_case_matches_geometric_median_behavior():
    """With scale pinned by symmetric inliers, the translation fit reduces
    to a geometric median: one far outlier must NOT drag the solution the
    way a least-squares mean would."""
    rng = np.random.default_rng(3)
    p = rng.normal(size=(9, 3))
    g = 2.0 * p  # c*=2, t*=0 fits 9 points exactly
    p = np.concatenate([p, [[0.0, 0.0, 0.0]]])
    g = np.concatenate([g, [[50.0, 0.0, 0.0]]])  # outlier at p=0
    c, t = _fit_scale_shift_sum_of_norms(p, g)
    # sum-of-norms: 9 exact residuals beat 1 outlier -> keep (2, 0); LS
    # would move t by ~5 toward the outlier
    assert abs(c - 2.0) < 1e-6
    assert np.linalg.norm(t) < 1e-5


def test_rotation_alignment_matches_reference_formula():
    """align_rotations == the reference's double-precision addbmm+SVD+det
    construction (eval.py:196-202), and attains the orthogonal-Procrustes
    optimum (no random rotation perturbation improves the Frobenius fit)."""
    rng = np.random.default_rng(11)
    n = 8
    R_true = _rand_rot(rng)
    pred = np.stack([_rand_rot(rng) for _ in range(n)])
    gt = np.einsum("ij,njk->nik", R_true, pred)
    # small orthogonal perturbations of gt
    for i in range(n):
        W = 0.05 * rng.normal(size=(3, 3))
        E, _ = np.linalg.qr(np.eye(3) + (W - W.T) / 2)
        E *= np.sign(np.linalg.det(E))
        gt[i] = E @ gt[i]

    R_opt = align_rotations(pred, gt)

    # reference formula re-derived in float64 (eval.py:196-202)
    Q = np.zeros((3, 3))
    for i in range(n):
        Q += gt[i] @ pred[i].T
    Uq, _, Vqt = np.linalg.svd(Q)
    sv = np.ones(3)
    sv[-1] = np.linalg.det(Uq @ Vqt)
    R_ref = Uq @ np.diag(sv) @ Vqt
    np.testing.assert_allclose(R_opt, R_ref, atol=1e-10)

    def frob(R):
        return sum(np.linalg.norm(R @ pred[i] - gt[i]) ** 2
                   for i in range(n))

    f_star = frob(R_opt)
    for _ in range(100):
        W = rng.normal(size=(3, 3))
        A = (W - W.T) / 2
        for r in (1e-3, 1e-2):
            # rodrigues-ish small rotation exp(r A) ~ I + rA + r^2A^2/2
            E = np.eye(3) + r * A + 0.5 * (r * A) @ (r * A)
            Eq, _ = np.linalg.qr(E)
            Eq *= np.sign(np.linalg.det(Eq))
            assert frob(Eq @ R_opt) >= f_star - 1e-9


def test_end_to_end_camera_accuracy_recovers_alignment():
    """Full path: predicted poses = similarity-transformed GT + noise ->
    errors near zero and exact alignment recovery in the noiseless case."""
    rng = np.random.default_rng(5)
    n = 10
    gt_Rs = np.stack([_rand_rot(rng) for _ in range(n)])
    gt_ts = rng.normal(size=(n, 3)) * 2
    R_mis = _rand_rot(rng)
    c_mis, t_mis = 1.3, np.array([0.2, 0.7, -0.4])
    # pred such that R_opt @ pred_R = gt_R and c(R_opt pred_t)+t = gt_t
    pred_Rs = np.einsum("ij,njk->nik", R_mis.T, gt_Rs)
    pred_ts = np.einsum("ij,nj->ni", R_mis.T, (gt_ts - t_mis) / c_mis)
    res = camera_accuracy(pred_Rs, pred_ts, gt_Rs, gt_ts)
    assert res["R_errors_deg"].max() < 1e-5
    assert res["t_errors"].max() < 1e-7
    np.testing.assert_allclose(res["R_opt"], R_mis, atol=1e-9)
    assert abs(res["scale"] - c_mis) < 1e-8

import numpy as np

from mvsdf_tpu.eval.chamfer import sample_surface, dtu_style_eval
from mvsdf_tpu.eval.marching import marching_tetrahedra


def sphere_mesh(radius=0.5, res=32):
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    vol = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - radius
    step = xs[1] - xs[0]
    return marching_tetrahedra(vol, 0.0, (step,) * 3, (xs[0],) * 3)


def test_sample_surface_on_mesh():
    verts, faces = sphere_mesh()
    pts = sample_surface(verts, faces, 5000)
    r = np.linalg.norm(pts, axis=1)
    assert np.abs(r - 0.5).max() < 0.05
    # uniform over the sphere: octant counts roughly equal
    oct_counts = np.bincount(
        (pts[:, 0] > 0) * 4 + (pts[:, 1] > 0) * 2 + (pts[:, 2] > 0),
        minlength=8)
    assert oct_counts.min() > 0.6 * oct_counts.max()


def test_dtu_eval_zero_for_matching_surfaces():
    verts, faces = sphere_mesh()
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(20000, 3))
    gt = gt / np.linalg.norm(gt, axis=1, keepdims=True) * 0.5
    m = dtu_style_eval(verts, faces, gt, n_samples=20000)
    assert m["overall"] < 0.02


def test_dtu_eval_detects_radius_error():
    verts, faces = sphere_mesh(radius=0.5)
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(20000, 3))
    gt = gt / np.linalg.norm(gt, axis=1, keepdims=True) * 0.6  # r mismatch
    m = dtu_style_eval(verts, faces, gt, n_samples=20000)
    assert 0.07 < m["overall"] < 0.13  # ~the 0.1 radius gap


def test_dtu_eval_bbox_and_outlier_filtering():
    verts, faces = sphere_mesh()
    rng = np.random.default_rng(2)
    gt = rng.normal(size=(10000, 3))
    gt = gt / np.linalg.norm(gt, axis=1, keepdims=True) * 0.5
    # distant outliers in GT are dropped by max_dist in completeness
    gt_noisy = np.concatenate([gt, np.full((100, 3), 50.0)])
    m = dtu_style_eval(verts, faces, gt_noisy, n_samples=10000, max_dist=5.0)
    assert m["overall"] < 0.02
    # bbox cropping removes a hemisphere from evaluation
    m2 = dtu_style_eval(verts, faces, gt, n_samples=10000,
                        bbox=np.array([[-1, -1, -1], [1, 1, 0]]))
    assert m2["overall"] < 0.02

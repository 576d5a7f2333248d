"""Hand-computed cases for the official-protocol DTU evaluation
(observability mask, BB crop, ground-plane filter, max-dist truncation)."""
import numpy as np

from mvsdf_tpu.eval.dtu_eval import (dtu_official_eval,
                                     dtu_official_eval_mesh,
                                     downsample_points, sample_triangles,
                                     prepare_reconstruction_points)


def test_hand_computed_mask_plane_truncation():
    stl = np.array([[0.0, 0, 0], [10.0, 0, 0]])
    bb = np.array([[0.0, -1, -1], [10.0, 1, 1]])
    res = 1.0
    mask = np.ones((11, 3, 3), bool)
    mask[10, 1, 1] = False  # voxel holding rec point B

    rec = np.array([
        [0.0, 0, 0.4],    # A: observable, dist to stl = 0.4
        [10.0, 0, 0.4],   # B: masked out of accuracy
        [5.0, 0, 0.0],    # C: observable, dist to stl = 5.0
    ])
    plane = np.array([1.0, 0, 0, -5.0])  # keeps stl x > 5: only (10,0,0)

    out = dtu_official_eval(rec, stl, obs_mask=mask, bb=bb, res=res,
                            ground_plane=plane, max_dist=20.0)
    # accuracy over observable A and C: (0.4 + 5.0) / 2
    np.testing.assert_allclose(out["accuracy"], 2.7, atol=1e-12)
    assert out["n_rec_obs"] == 2
    # completeness: stl (10,0,0) -> nearest of {A, B, C} = B at 0.4
    np.testing.assert_allclose(out["completeness"], 0.4, atol=1e-12)
    assert out["n_stl_above"] == 1
    np.testing.assert_allclose(out["overall"], 0.5 * (2.7 + 0.4),
                               atol=1e-12)

    # max_dist truncation drops C from the accuracy mean
    out2 = dtu_official_eval(rec, stl, obs_mask=mask, bb=bb, res=res,
                             ground_plane=plane, max_dist=2.0)
    np.testing.assert_allclose(out2["accuracy"], 0.4, atol=1e-12)

    # without mask/plane both sides use everything
    out3 = dtu_official_eval(rec, stl, max_dist=20.0)
    np.testing.assert_allclose(out3["accuracy"], (0.4 + 0.4 + 5.0) / 3,
                               atol=1e-12)
    # stl (0,0,0)->A=0.4, (10,0,0)->B=0.4
    np.testing.assert_allclose(out3["completeness"], 0.4, atol=1e-12)


def test_bb_crop_excludes_far_points():
    stl = np.array([[0.0, 0, 0]])
    bb = np.array([[0.0, 0, 0], [1.0, 1, 1]])
    rec = np.array([[0.0, 0, 0.25],
                    [500.0, 0, 0]])  # outside BB + patch margin
    out = dtu_official_eval(rec, stl, bb=bb, res=1.0, patch=60.0)
    np.testing.assert_allclose(out["accuracy"], 0.25, atol=1e-12)
    # the far point is also absent from the completeness target set
    np.testing.assert_allclose(out["completeness"], 0.25, atol=1e-12)


def test_downsample_collapses_clusters():
    pts = np.concatenate([
        np.zeros((10, 3)) + np.linspace(0, 0.05, 10)[:, None],  # cluster
        np.array([[5.0, 0, 0]]),
    ])
    down = downsample_points(pts, thresh=0.2, seed=0)
    assert len(down) == 2
    # greedy radius downsampling never leaves two points within thresh
    from scipy.spatial import cKDTree
    d = cKDTree(down).query(down, k=2)[0][:, 1]
    assert (d > 0.2).all()


def test_sample_triangles_densifies():
    verts = np.array([[0.0, 0, 0], [1.0, 0, 0], [0.0, 1, 0]])
    faces = np.array([[0, 1, 2]])
    dense = sample_triangles(verts, faces, thresh=0.11)
    assert len(dense) > 30  # ~half of a 10x10 barycentric grid + verts
    # every sample stays inside the triangle (z = 0, x,y >= 0, x+y <= 1)
    assert np.allclose(dense[:, 2], 0)
    assert (dense[:, 0] >= -1e-12).all() and (dense[:, 1] >= -1e-12).all()
    assert (dense[:, 0] + dense[:, 1] <= 1 + 1e-12).all()


def test_mesh_eval_identical_planes():
    """Two identical planar meshes -> near-zero chamfer at sample density.
    """
    verts = np.array([[0.0, 0, 0], [10.0, 0, 0], [0.0, 10, 0],
                      [10.0, 10, 0]])
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    stl = prepare_reconstruction_points(verts, faces, thresh=0.3, seed=1)
    out = dtu_official_eval_mesh(verts, faces, stl, thresh=0.3)
    assert out["overall"] < 0.3

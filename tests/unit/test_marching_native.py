"""Native C++ marching tetrahedra vs the numpy reference implementation."""
import numpy as np
import pytest

from mvsdf_tpu.eval.marching import marching_tetrahedra


def sphere_vol(res, center=(0.02, -0.04, 0.01), radius=0.55):
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return (np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2 +
                    (Z - center[2]) ** 2) - radius), xs


def _canon_faces(verts, faces):
    key = (verts[faces] * 1e4).round().astype(np.int64)
    flat = key.reshape(len(faces), 9)
    order = np.lexsort(flat.T[::-1])
    return flat[order]


def test_native_matches_numpy():
    res = 36
    vol, xs = sphere_vol(res)
    step = xs[1] - xs[0]
    v_np, f_np = marching_tetrahedra(vol, 0.0, (step,) * 3, (xs[0],) * 3,
                                     native=False)
    v_cc, f_cc = marching_tetrahedra(vol, 0.0, (step,) * 3, (xs[0],) * 3,
                                     native=True)
    # identical vertex arrays by construction (sorted global-edge-key order)
    assert v_cc.shape == v_np.shape
    np.testing.assert_allclose(v_cc, v_np, atol=1e-5)
    assert len(f_cc) == len(f_np)
    # same face set (emission order may differ)
    np.testing.assert_array_equal(_canon_faces(v_cc, f_cc),
                                  _canon_faces(v_np, f_np))


def test_native_watertight_oriented():
    res = 28
    vol, xs = sphere_vol(res, radius=0.5)
    step = xs[1] - xs[0]
    verts, faces = marching_tetrahedra(vol, 0.0, (step,) * 3, (xs[0],) * 3,
                                       native=True)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    keys = edges.min(1).astype(np.int64) * len(verts) + edges.max(1)
    _, counts = np.unique(keys, return_counts=True)
    assert (counts == 2).all()
    v0 = verts[faces[:, 0]]
    n = np.cross(verts[faces[:, 1]] - v0, verts[faces[:, 2]] - v0)
    c = (verts[faces[:, 0]] + verts[faces[:, 1]] + verts[faces[:, 2]]) / 3
    center = np.array([0.02, -0.04, 0.01])
    assert ((n * (c - center)).sum(1) > 0).mean() > 0.99


def test_native_speedup_large_grid():
    import time
    res = 96
    vol, xs = sphere_vol(res)
    step = xs[1] - xs[0]
    t0 = time.perf_counter()
    v1, f1 = marching_tetrahedra(vol, 0.0, (step,) * 3, (xs[0],) * 3,
                                 native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    v2, f2 = marching_tetrahedra(vol, 0.0, (step,) * 3, (xs[0],) * 3,
                                 native=False)
    t_numpy = time.perf_counter() - t0
    assert len(f1) == len(f2)
    assert t_native < t_numpy  # typically ~10x

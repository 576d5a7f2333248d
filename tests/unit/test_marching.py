import numpy as np
import jax.numpy as jnp

from mvsdf_tpu.eval.marching import (marching_tetrahedra, eval_sdf_grid,
                                     extract_mesh)
from mvsdf_tpu.eval.mesh import (biggest_component, face_areas, save_obj,
                                 load_obj)
from mvsdf_tpu.eval.psnr import masked_psnr, chamfer_points


def sphere_vol(res, center, radius, bounds=(-1, 1)):
    xs = np.linspace(bounds[0], bounds[1], res, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return (np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2 +
                    (Z - center[2]) ** 2) - radius), xs


def test_marching_tets_sphere_accuracy():
    res = 48
    vol, xs = sphere_vol(res, (0.03, -0.05, 0.02), 0.6)
    step = xs[1] - xs[0]
    verts, faces = marching_tetrahedra(vol, 0.0, (step,) * 3,
                                       (xs[0],) * 3)
    assert len(verts) > 500 and len(faces) > 1000
    r = np.linalg.norm(verts - np.array([0.03, -0.05, 0.02]), axis=-1)
    # sub-voxel accuracy
    assert np.abs(r - 0.6).max() < step * 0.6
    assert np.abs(r - 0.6).mean() < step * 0.1


def test_marching_tets_watertight_and_oriented():
    res = 32
    vol, xs = sphere_vol(res, (0, 0, 0), 0.55)
    step = xs[1] - xs[0]
    verts, faces = marching_tetrahedra(vol, 0.0, (step,) * 3, (xs[0],) * 3)
    # closed surface: every edge appears exactly twice
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    keys = edges.min(1).astype(np.int64) * len(verts) + edges.max(1)
    _, counts = np.unique(keys, return_counts=True)
    assert (counts == 2).all()
    # outward orientation: normals point away from center
    v0 = verts[faces[:, 0]]
    n = np.cross(verts[faces[:, 1]] - v0, verts[faces[:, 2]] - v0)
    c = (verts[faces[:, 0]] + verts[faces[:, 1]] + verts[faces[:, 2]]) / 3
    assert ((n * c).sum(1) > 0).mean() > 0.99
    # divergence-theorem volume ~ sphere volume
    vol_est = np.abs((v0 * n).sum() / 6 +
                     np.cross(verts[faces[:, 1]], verts[faces[:, 2]]).dot(
                         np.zeros(3)).sum())
    signed = (np.cross(verts[faces[:, 1]], verts[faces[:, 2]]) *
              v0).sum() / 6.0
    assert abs(signed - 4 / 3 * np.pi * 0.55 ** 3) < 0.05


def test_grid_eval_and_extract():
    def sdf(x):
        return jnp.linalg.norm(x, axis=-1) - 0.5

    vol = eval_sdf_grid(sdf, resolution=24, slab=5)
    assert vol.shape == (24, 24, 24)
    xs = np.linspace(-1, 1, 24)
    expect = np.linalg.norm([xs[12]] * 3) - 0.5
    assert abs(float(vol[12, 12, 12]) - expect) < 1e-5

    verts, faces = extract_mesh(sdf, resolution=32, slab=8)
    r = np.linalg.norm(verts, axis=-1)
    assert np.abs(r - 0.5).max() < 0.05


def test_extract_mesh_scale_mat():
    def sdf(x):
        return jnp.linalg.norm(x, axis=-1) - 0.5

    S = np.eye(4, dtype=np.float32)
    S[:3, :3] *= 10.0
    S[:3, 3] = [1, 2, 3]
    verts, _ = extract_mesh(sdf, resolution=24, scale_mat=S)
    r = np.linalg.norm(verts - np.array([1, 2, 3]), axis=-1)
    assert np.abs(r - 5.0).max() < 0.5


def test_biggest_component():
    # two spheres, one bigger
    res = 40
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    d1 = np.sqrt((X + 0.45) ** 2 + Y ** 2 + Z ** 2) - 0.4
    d2 = np.sqrt((X - 0.6) ** 2 + Y ** 2 + Z ** 2) - 0.15
    vol = np.minimum(d1, d2)
    step = xs[1] - xs[0]
    verts, faces = marching_tetrahedra(vol, 0.0, (step,) * 3, (xs[0],) * 3)
    v2, f2 = biggest_component(verts, faces)
    assert len(f2) < len(faces)
    # only the big sphere remains
    assert (v2[:, 0] < 0.3).all()
    assert face_areas(v2, f2).sum() > 0.8 * 4 * np.pi * 0.4 ** 2


def test_obj_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    p = str(tmp_path / "m.obj")
    save_obj(p, verts, faces, colors)
    v, f, c = load_obj(p)
    np.testing.assert_allclose(v, verts, atol=1e-5)
    np.testing.assert_array_equal(f, faces)
    np.testing.assert_allclose(c, colors, atol=1e-4)


def test_masked_psnr():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 16, 3))
    mask = np.zeros((16, 16, 1))
    mask[4:12, 4:12] = 1
    noisy = img + rng.normal(0, 0.1, img.shape)
    p = masked_psnr(img * mask, noisy * mask, mask)
    assert 15 < p < 25


def test_chamfer_points():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(500, 3))
    assert chamfer_points(a, a) < 1e-9
    b = a + 0.01
    assert 0.005 < chamfer_points(a, b) < 0.02

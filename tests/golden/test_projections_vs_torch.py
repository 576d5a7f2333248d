"""Golden parity of image sampling and camera math vs torch."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax.numpy as jnp

from mvsdf_tpu.geometry import projections as proj
from mvsdf_tpu.geometry.cameras import get_camera_params
from tests.golden.reference_harness import import_reference


def test_grid_sample_bilinear_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 5, 17, 13)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (1, 1, 200, 2)).astype(np.float32)
    ref = F.grid_sample(torch.from_numpy(img), torch.from_numpy(grid),
                        mode="bilinear", padding_mode="zeros",
                        align_corners=False).numpy()  # (1, 5, 1, 200)
    ours = proj.grid_sample_bilinear(jnp.asarray(img[0]),
                                     jnp.asarray(grid[0, 0]))  # (200, 5)
    np.testing.assert_allclose(np.asarray(ours).T, ref[0, :, 0], atol=1e-5)


def test_grid_sample_nearest_matches_torch():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 1, 9, 11)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, (1, 1, 500, 2)).astype(np.float32)
    ref = F.grid_sample(torch.from_numpy(img), torch.from_numpy(grid),
                        mode="nearest", padding_mode="zeros",
                        align_corners=False).numpy()
    ours = proj.grid_sample_nearest(jnp.asarray(img[0]),
                                    jnp.asarray(grid[0, 0]))
    mism = np.abs(np.asarray(ours)[:, 0] - ref[0, 0, 0]) > 1e-6
    # rounding ties at exact .5 boundaries may differ; must be rare
    assert mism.mean() < 0.01


def test_get_camera_params_matches_reference():
    ref = import_reference()
    rng = np.random.default_rng(2)
    B, P = 2, 50
    uv = rng.uniform(0, 64, (B, P, 2)).astype(np.float32)
    K = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    K[:, 0, 0] = 55.0
    K[:, 1, 1] = 57.0
    K[:, 0, 2] = 32.0
    K[:, 1, 2] = 31.0
    K[:, 0, 1] = 0.3  # skew exercised
    pose = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    pose[:, :3, 3] = rng.normal(size=(B, 3)) * 2
    with torch.no_grad():
        rd_ref, cam_ref = ref["rend"].get_camera_params(
            torch.from_numpy(uv), torch.from_numpy(pose),
            torch.from_numpy(K))
    rd, cam = get_camera_params(jnp.asarray(uv), jnp.asarray(pose),
                                jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(rd), rd_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam), cam_ref.numpy(), atol=1e-6)


def test_projection_chain_roundtrip_matches_reference():
    ref = import_reference()
    my = ref["my"]
    rng = np.random.default_rng(3)
    cam = np.zeros((1, 2, 4, 4), np.float32)
    # simple lookat cam
    from tests.golden.scene_fixtures import look_at_extrinsic
    cam[0, 0] = look_at_extrinsic((0.3, 0.4, 2.0))
    cam[0, 1, :3, :3] = [[40, 0, 16], [0, 40, 16], [0, 0, 1]]
    pts = rng.uniform(-0.5, 0.5, (1, 64, 3, 1)).astype(np.float32)
    pts_hom = np.concatenate([pts, np.ones_like(pts[:, :, :1])], axis=2)
    pts_hom_t = torch.from_numpy(pts_hom).unsqueeze(1)  # n1m41

    with torch.no_grad():
        cam_t = torch.from_numpy(cam)
        pc_ref = my.idx_world2cam(pts_hom_t, cam_t)
        pi_ref = my.idx_cam2img(pc_ref, cam_t)

    pc = proj.world_to_cam(jnp.asarray(pts_hom[0, :, :, 0]),
                           jnp.asarray(cam[0]))
    pi = proj.cam_to_img(pc, jnp.asarray(cam[0]))
    np.testing.assert_allclose(np.asarray(pc),
                               pc_ref.numpy()[0, 0, :, :, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(pi),
                               pi_ref.numpy()[0, 0, :, :, 0], atol=1e-3)

"""End-to-end over the on-disk dataset format: synthesize a scene directory
in the reference layout (image_hd/, mask_hd/, cameras_hd.npz, depth/*.pfm,
../pair.txt, ../cam_*_flow3.txt), load it with SceneData, and train a few
epochs through the real Trainer."""
import os

import numpy as np
import pytest

from mvsdf_tpu.data import formats
from mvsdf_tpu.data.scene import SceneData
from tests.golden.scene_fixtures import make_scene, look_at_extrinsic


def write_scene_dir(root, n_images=3, img_hw=32, depth_hw=16,
                    sphere_radius=0.5):
    data_dir = os.path.join(root, "scene")
    os.makedirs(os.path.join(data_dir, "image_hd"))
    os.makedirs(os.path.join(data_dir, "mask_hd"))
    os.makedirs(os.path.join(data_dir, "depth"))
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    H = W = img_hw
    h = w = depth_hw
    angles = np.linspace(0, 2 * np.pi, n_images, endpoint=False)
    cam_pos = np.stack([2.2 * np.sin(angles), 0.3 * np.ones_like(angles),
                        2.2 * np.cos(angles)], -1)
    extr = np.stack([look_at_extrinsic(p) for p in cam_pos])
    f = 30.0
    K_hd = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    K_d = K_hd.copy()
    K_d[:2] *= h / H

    cam_npz = {}
    pair = {"id_list": [str(i) for i in range(n_images)]}
    for i in range(n_images):
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        imageio.imwrite(os.path.join(data_dir, "image_hd", f"{i:03}.png"),
                        img)
        imageio.imwrite(os.path.join(data_dir, "mask_hd", f"{i:03}.png"),
                        np.full((H, W), 255, np.uint8))
        # depth of a sphere
        ys, xs = np.mgrid[0:h, 0:w]
        pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)],
                       -1).reshape(-1, 3).astype(np.float64)
        dirs_cam = (np.linalg.inv(K_d) @ pix.T).T
        R = extr[i][:3, :3]
        dirs_w = dirs_cam @ R
        nrm = np.linalg.norm(dirs_w, axis=-1, keepdims=True)
        dirs_w = dirs_w / nrm
        o = cam_pos[i]
        b = dirs_w @ o
        disc = b ** 2 - (o @ o - sphere_radius ** 2)
        tq = -b - np.sqrt(np.maximum(disc, 0))
        z = tq * dirs_cam[:, 2] / np.linalg.norm(dirs_cam, axis=-1)
        z = np.where(disc > 0, z, 0.0).astype(np.float32).reshape(h, w)
        formats.write_pfm(os.path.join(data_dir, "depth", f"{i:03}.pfm"), z)

        P = np.zeros((4, 4), np.float32)
        P[:3] = K_hd @ extr[i][:3]
        P[3, 3] = 1
        S = np.eye(4, dtype=np.float32)  # size 2, center 0
        cam_npz[f"world_mat_{i}"] = P
        cam_npz[f"scale_mat_{i}"] = S

        cam = np.zeros((2, 4, 4))
        cam[0] = extr[i]
        cam[1][:3, :3] = K_d
        cam[1][3] = [0.5, 0.01, 256, 0.5 + 0.01 * 255]
        formats.write_cam(os.path.join(root, f"cam_{i:08}_flow3.txt"), cam)
        others = [j for j in range(n_images) if j != i][:2]
        pair[str(i)] = {"id": str(i), "index": i,
                        "pair": [str(j) for j in others],
                        "score": [10.0 - k for k in range(len(others))]}
    np.savez(os.path.join(data_dir, "cameras_hd.npz"), **cam_npz)
    formats.write_pair(os.path.join(root, "pair.txt"), pair)
    return data_dir


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return write_scene_dir(str(tmp_path_factory.mktemp("data")))


def test_scene_data_loads(scene_dir):
    sd = SceneData(scene_dir, allow_random_features=True)
    assert sd.n_images == 3
    assert sd.img_res == (32, 32)
    assert sd.depths.shape == (3, 1, 16, 16)
    assert sd.feats.shape[1] == 32  # frozen CNN features
    assert abs(float(sd.size) - 2.0) < 1e-6
    # decomposed cameras re-project: pose/intrinsics sane
    assert np.allclose(sd.poses[0][3], [0, 0, 0, 1], atol=1e-5)
    # camera centers at radius 2.2
    r = np.linalg.norm(sd.poses[:, :3, 3], axis=1)
    assert np.allclose(r, np.sqrt(2.2 ** 2 + 0.3 ** 2), atol=1e-3)
    srcs = sd.src_indices(0)
    assert len(srcs) == 2


@pytest.mark.slow
def test_trainer_runs_on_disk_scene(scene_dir, tmp_path):
    import dataclasses
    from mvsdf_tpu.config import (MVSDFConfig, ModelConfig, Schedule,
                                  TrainConfig)
    from mvsdf_tpu.fields.sdf import ImplicitConfig
    from mvsdf_tpu.fields.radiance import RenderConfig
    from mvsdf_tpu.tracing.sphere_trace import TracerConfig
    from mvsdf_tpu.train.loop import Trainer

    sd = SceneData(scene_dir, allow_random_features=True)
    cfg = MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=32, dims=(32,) * 2,
                                    skip_in=(), multires=4),
            render=RenderConfig(feature_vector_size=32, dims=(32,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=3, n_steps=12,
                                n_secant_steps=2, sample_chunk=0)),
        schedule=Schedule(),
        train=TrainConfig(batch_size=3, num_pixels=32, nepochs=4))
    tr = Trainer(cfg, sd, str(tmp_path / "exp"), use_mesh=False)
    state = tr.run(resume=False)
    assert state is not None
    # checkpoint written and restorable
    tr2 = Trainer(cfg, sd, str(tmp_path / "exp"), use_mesh=False)
    assert tr2.maybe_resume()
    assert int(tr2.state.epoch) == 4
    # metrics log exists
    assert os.path.exists(str(tmp_path / "exp" / "metrics.jsonl"))


@pytest.mark.slow
def test_camera_opt_checkpoint_roundtrip_and_accuracy(scene_dir, tmp_path):
    """pose_vecs/cam_opt persist through checkpoints (ref saves
    CamParameters/*.pth, idr_train.py:188-199) and the restored poses
    feed the camera-accuracy evaluation (ref eval.py:89-104)."""
    import dataclasses
    import jax.numpy as jnp
    from mvsdf_tpu.config import (MVSDFConfig, ModelConfig, Schedule,
                                  TrainConfig)
    from mvsdf_tpu.fields.sdf import ImplicitConfig
    from mvsdf_tpu.fields.radiance import RenderConfig
    from mvsdf_tpu.tracing.sphere_trace import TracerConfig
    from mvsdf_tpu.train.loop import Trainer
    from mvsdf_tpu.train.step import init_train_state
    from mvsdf_tpu.train import checkpoints as ckpt
    from mvsdf_tpu.geometry.cameras import quat_to_rot
    from mvsdf_tpu.eval.cameras import camera_accuracy

    sd = SceneData(scene_dir, allow_random_features=True)
    cfg = MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=32, dims=(32,) * 2,
                                    skip_in=(), multires=4),
            render=RenderConfig(feature_vector_size=32, dims=(32,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=3, n_steps=12,
                                n_secant_steps=2, sample_chunk=0)),
        schedule=Schedule(),
        train=TrainConfig(batch_size=3, num_pixels=32, nepochs=2,
                          train_cameras=True))
    tr = Trainer(cfg, sd, str(tmp_path / "exp"), use_mesh=False)
    state = tr.run(resume=False)
    assert state.pose_vecs is not None

    like = init_train_state(cfg, seed=1, pose_init=sd.poses)
    restored, _ = ckpt.restore_checkpoint(
        str(tmp_path / "exp" / "checkpoints"), None, like)
    assert restored.pose_vecs is not None
    np.testing.assert_allclose(np.asarray(restored.pose_vecs),
                               np.asarray(state.pose_vecs), atol=1e-7)

    pv = np.asarray(restored.pose_vecs)
    pred_Rs = np.asarray(quat_to_rot(jnp.asarray(pv[:, :4])))
    gt = sd.get_gt_pose()
    acc = camera_accuracy(pred_Rs, pv[:, 4:].astype(np.float64),
                          gt[:, :3, :3], gt[:, :3, 3])
    # poses barely moved in 2 epochs; alignment must stay tight
    assert acc["R_errors_deg"].mean() < 5.0
    assert acc["t_errors"].mean() < 0.5


def test_eval_cameras_requires_pose_checkpoint(scene_dir, tmp_path):
    """--eval_cameras on a camera-less checkpoint fails with a clear
    message rather than garbage output."""
    import dataclasses
    from mvsdf_tpu.config import (MVSDFConfig, ModelConfig, Schedule,
                                  TrainConfig)
    from mvsdf_tpu.fields.sdf import ImplicitConfig
    from mvsdf_tpu.fields.radiance import RenderConfig
    from mvsdf_tpu.tracing.sphere_trace import TracerConfig
    from mvsdf_tpu.train.step import init_train_state
    from mvsdf_tpu.train import checkpoints as ckpt

    cfg = MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=32, dims=(32,) * 2,
                                    skip_in=(), multires=4),
            render=RenderConfig(feature_vector_size=32, dims=(32,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=3, n_steps=12,
                                n_secant_steps=2, sample_chunk=0)),
        schedule=Schedule(), train=TrainConfig(batch_size=3, num_pixels=32))
    state = init_train_state(cfg, seed=0)
    ckpt.save_checkpoint(str(tmp_path / "ck"), 1, state)
    restored, _ = ckpt.restore_checkpoint(str(tmp_path / "ck"), None, state)
    assert restored.pose_vecs is None


def test_linear_init_poses(scene_dir):
    """cameras_linear_init.npz provides the camera-opt initialization when
    present (ref get_pose_init, scene_dataset.py:270-287); GT poses are
    the fallback."""
    sd = SceneData(scene_dir, allow_random_features=True)
    assert sd.pose_init is sd.poses  # no file -> GT fallback

    # write a perturbed linear init (translate each camera by +0.05 x)
    cams = np.load(os.path.join(scene_dir, "cameras_hd.npz"))
    lin = {}
    for i in range(sd.n_images):
        w = cams[f"world_mat_{i}"].copy()
        s = cams[f"scale_mat_{i}"].copy()
        # shift the camera center: P = K [R | t], t' = t - R*(dx)
        K_R_t = (w @ s)[:3, :4]
        K_R_t = K_R_t.copy()
        K_R_t[:, 3] -= K_R_t[:, 0] * 0.05
        w2 = np.eye(4, dtype=np.float32)
        w2[:3, :4] = K_R_t
        lin[f"world_mat_{i}"] = w2
        lin[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
    np.savez(os.path.join(scene_dir, "cameras_linear_init.npz"), **lin)
    try:
        sd2 = SceneData(scene_dir, allow_random_features=True)
        assert not np.allclose(sd2.pose_init, sd2.poses)
        # rotation part preserved, translation moved
        assert np.allclose(sd2.pose_init[:, :3, :3], sd2.poses[:, :3, :3],
                           atol=1e-4)
        d = np.linalg.norm(sd2.pose_init[:, :3, 3] - sd2.poses[:, :3, 3],
                           axis=1)
        assert np.all(d > 1e-3)

        # the trainer's camera state starts from the linear init
        from mvsdf_tpu.train.cameras_opt import pose_vecs_from_matrices
        want = pose_vecs_from_matrices(sd2.pose_init)
        from mvsdf_tpu.config import (MVSDFConfig, ModelConfig, Schedule,
                                      TrainConfig)
        from mvsdf_tpu.fields.sdf import ImplicitConfig
        from mvsdf_tpu.fields.radiance import RenderConfig
        from mvsdf_tpu.tracing.sphere_trace import TracerConfig
        cfg = MVSDFConfig(
            model=ModelConfig(
                implicit=ImplicitConfig(feature_vector_size=32,
                                        dims=(32,) * 2, skip_in=(),
                                        multires=4),
                render=RenderConfig(feature_vector_size=32, dims=(32,),
                                    multires_view=2),
                tracer=TracerConfig(sphere_tracing_iters=3, n_steps=12,
                                    n_secant_steps=2, sample_chunk=0)),
            schedule=Schedule(),
            train=TrainConfig(batch_size=3, num_pixels=32, nepochs=4,
                              train_cameras=True))
        from mvsdf_tpu.train.loop import Trainer
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            tr = Trainer(cfg, sd2, td, use_mesh=False)
            got = np.asarray(tr.state.pose_vecs)
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        os.remove(os.path.join(scene_dir, "cameras_linear_init.npz"))

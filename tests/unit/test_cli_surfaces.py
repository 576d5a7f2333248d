"""In-process tests of the train/eval CLI surfaces (arg parity with the
reference's exp_runner.py / eval.py): train a tiny on-disk scene through
``mvsdf_tpu.train.cli.main``, resume with --is_continue, then extract a
mesh through ``mvsdf_tpu.eval.cli.main``."""
import os

import numpy as np
import pytest

from tests.unit.test_scene_dir_integration import write_scene_dir

CONF = """
train{
    num_pixels = 64
    sched_milestones = [4/6, 5/6]
    sched_factor = 0.1
}
plot{
    plot_nimgs = 1
    resolution = 32
}
loss{}
dataset{}
model{
    feature_vector_size = 32
    implicit_network {
        d_in = 3
        d_out = 1
        dims = [48, 48, 48, 48]
        geometric_init = True
        bias = 0.6
        skip_in = [2]
        weight_norm = True
        multires = 6
    }
    rendering_network {
        mode = idr
        d_in = 9
        d_out = 3
        dims = [48]
        weight_norm = True
        multires_view = 4
    }
    ray_tracer {
        object_bounding_sphere = 1.0
        sdf_threshold = 5.0e-5
        line_search_step = 0.5
        line_step_iters = 3
        sphere_tracing_iters = 5
        n_steps = 24
        n_secant_steps = 4
    }
}
"""


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    scene = write_scene_dir(str(root), n_images=3, img_hw=32, depth_hw=16)
    conf = root / "small.conf"
    conf.write_text(CONF)
    return {"scene": scene, "conf": str(conf),
            "exps": str(root / "exps"), "evals": str(root / "evals")}


@pytest.mark.slow
def test_train_eval_cli_roundtrip(cli_env):
    from mvsdf_tpu.train import cli as train_cli
    from mvsdf_tpu.eval import cli as eval_cli

    common = ["--data_dir", cli_env["scene"], "--conf", cli_env["conf"],
              "--expname", "clismoke", "--exps_folder", cli_env["exps"]]
    train_cli.main(common + ["--batch_size", "3", "--nepoch", "2",
                             "--num_pixels", "64", "--no_mesh",
                             "--allow_random_features"])
    exp = os.path.join(cli_env["exps"], "clismoke")
    stamps = os.listdir(exp)
    assert len(stamps) == 1
    ckpt = os.path.join(exp, stamps[0], "checkpoints")
    assert os.path.isdir(ckpt)

    # resume continues from the stored epoch into the same timestamp dir
    train_cli.main(common + ["--batch_size", "3", "--nepoch", "4",
                             "--num_pixels", "64", "--no_mesh",
                             "--allow_random_features", "--is_continue"])
    assert os.listdir(exp) == stamps

    eval_cli.main(["--data_dir", cli_env["scene"], "--conf",
                   cli_env["conf"], "--expname", "clismoke",
                   "--exps_folder", cli_env["exps"],
                   "--evals_folder", cli_env["evals"],
                   "--resolution", "32"])
    evaldir = os.path.join(cli_env["evals"], "clismoke")
    objs = [f for f in os.listdir(evaldir) if f.endswith(".obj")]
    assert objs, f"no mesh in {os.listdir(evaldir)}"
    # mesh has vertex colors (surface-indicator sigmoid, ref plots.py:200)
    first_v = next(l for l in open(os.path.join(evaldir, objs[0]))
                   if l.startswith("v "))
    assert len(first_v.split()) == 7  # v x y z r g b

    # free-viewpoint rendering (the reference's IDR_ONLY_CAM=1 mode):
    # reuse the scene's own cameras as the novel path
    eval_cli.main(["--data_dir", cli_env["scene"], "--conf",
                   cli_env["conf"], "--expname", "clismoke",
                   "--exps_folder", cli_env["exps"],
                   "--evals_folder", cli_env["evals"],
                   "--only_cam",
                   os.path.join(cli_env["scene"], "cameras_hd.npz"),
                   "--only_cam_size", "16,16"])
    out2 = os.path.join(evaldir, "rendering2")
    pngs = [f for f in os.listdir(out2) if f.endswith(".png")]
    assert len(pngs) == 3


def test_train_cli_errors(cli_env, tmp_path):
    from mvsdf_tpu.train import cli as train_cli
    with pytest.raises(FileNotFoundError):
        train_cli.main(["--data_dir", str(tmp_path / "nope"),
                        "--conf", cli_env["conf"], "--expname", "x",
                        "--exps_folder", str(tmp_path / "exps")])
    with pytest.raises(ValueError):
        train_cli.main(["--data_dir", cli_env["scene"],
                        "--conf", cli_env["conf"], "--expname", "x",
                        "--exps_folder", str(tmp_path / "exps"),
                        "--batch_size", "99", "--nepoch", "1",
                        "--allow_random_features"])

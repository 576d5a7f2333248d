"""The fused multi-epoch dispatch (device-resident cache + lax.scan) must
be numerically interchangeable with the reference-shaped per-epoch path:
same host RNG stream, same batches, same final parameters."""
import os

import numpy as np
import pytest

from mvsdf_tpu.config import (MVSDFConfig, ModelConfig, Schedule,
                              TrainConfig)
from mvsdf_tpu.fields.sdf import ImplicitConfig
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.data.scene import SceneData
from mvsdf_tpu.train.loop import Trainer

from tests.unit.test_scene_dir_integration import write_scene_dir



pytestmark = pytest.mark.slow  # fused-dispatch integration runs whole trainings

@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return write_scene_dir(str(tmp_path_factory.mktemp("data")),
                           n_images=4)


def _cfg(nepochs=5, fused=True, epochs_per_dispatch=16):
    return MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=32, dims=(32,) * 2,
                                    skip_in=(), multires=4),
            render=RenderConfig(feature_vector_size=32, dims=(32,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=3, n_steps=12,
                                n_secant_steps=2, sample_chunk=0)),
        schedule=Schedule(),
        train=TrainConfig(batch_size=2, num_pixels=32, nepochs=nepochs,
                          fused_dispatch=fused,
                          epochs_per_dispatch=epochs_per_dispatch))


def test_fused_matches_per_epoch(scene_dir, tmp_path):
    sd = SceneData(scene_dir, allow_random_features=True)

    t_ref = Trainer(_cfg(fused=False), sd, str(tmp_path / "ref"),
                    use_mesh=False, log_fn=lambda *_: None)
    s_ref = t_ref.run(resume=False)

    t_fused = Trainer(_cfg(fused=True, epochs_per_dispatch=3), sd,
                      str(tmp_path / "fused"), use_mesh=False,
                      log_fn=lambda *_: None)
    s_fused = t_fused.run(resume=False)

    ref_leaves = np.concatenate([np.asarray(l).ravel() for l in
                                 __import__("jax").tree_util.tree_leaves(
                                     s_ref.params)])
    fused_leaves = np.concatenate([np.asarray(l).ravel() for l in
                                   __import__("jax").tree_util.tree_leaves(
                                       s_fused.params)])
    np.testing.assert_allclose(fused_leaves, ref_leaves, rtol=2e-5,
                               atol=2e-6)
    # metrics logged for every epoch on both paths
    for d in ("ref", "fused"):
        with open(str(tmp_path / d / "metrics.jsonl")) as f:
            steps = [__import__("json").loads(l)["step"]
                     for l in f.readlines()]
        assert steps == list(range(0, 6)), (d, steps)


def test_chunk_boundaries_respect_phase_and_plot(scene_dir, tmp_path):
    """Chunks never straddle a phase change or a checkpoint boundary."""
    sd = SceneData(scene_dir, allow_random_features=True)
    cfg = _cfg(nepochs=12, fused=True, epochs_per_dispatch=50)
    tr = Trainer(cfg, sd, str(tmp_path / "exp"), use_mesh=False,
                 log_fn=lambda *_: None)
    # phases split at 1/6 and 1/2 of 12 epochs; plot_freq = 1 means every
    # epoch >= 1 is a save boundary, so the chunk from 0 closes at 1
    assert tr.plot_freq == 1
    assert tr._chunk_end(0) == 1
    tr2 = Trainer(_cfg(nepochs=120, fused=True, epochs_per_dispatch=50),
                  sd, str(tmp_path / "exp2"), use_mesh=False,
                  log_fn=lambda *_: None)
    # plot_freq = 10: chunk from 0 stops at the first boundary
    assert tr2.plot_freq == 10
    assert tr2._chunk_end(0) == 10
    # phase A ends at epoch 19 (tp < 1/6 -> e/120 < 0.1666 -> e <= 19)
    assert tr2._chunk_end(11) == 19
    # 20 is itself a save boundary: singleton chunk so save(20) is exact
    assert tr2._chunk_end(20) == 20
    assert tr2._chunk_end(21) == 30
    assert tr2._chunk_end(61) == 70  # next plot boundary
    tr3 = Trainer(_cfg(nepochs=1200, fused=True, epochs_per_dispatch=16),
                  sd, str(tmp_path / "exp3"), use_mesh=False,
                  log_fn=lambda *_: None)
    assert tr3._chunk_end(601) == 616  # cap of 16 epochs per dispatch


def test_fused_checkpoint_resume(scene_dir, tmp_path):
    """Resume mid-training on the fused path restores bit-exact RNG."""
    sd = SceneData(scene_dir, allow_random_features=True)
    cfg = _cfg(nepochs=6, fused=True, epochs_per_dispatch=2)
    t1 = Trainer(cfg, sd, str(tmp_path / "full"), use_mesh=False,
                 log_fn=lambda *_: None)
    s_full = t1.run(resume=False)

    # train to the epoch-3 checkpoint (plot_freq = 6//12 -> every epoch)
    t2 = Trainer(cfg, sd, str(tmp_path / "half"), use_mesh=False,
                 log_fn=lambda *_: None)
    t2.run(resume=False)
    # restore from epoch 3 and retrain the rest
    t3 = Trainer(cfg, sd, str(tmp_path / "half"), use_mesh=False,
                 log_fn=lambda *_: None)
    s_resumed = t3.run(resume=True, resume_step=3)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

"""Integration: a short optimization run on a synthetic scene must reduce
the loss and keep parameters finite (SURVEY.md build order step 3)."""
import numpy as np
import jax
import jax.numpy as jnp

from mvsdf_tpu.config import MVSDFConfig, ModelConfig, Schedule, TrainConfig
from mvsdf_tpu.fields.sdf import ImplicitConfig
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                  weights_to_array)

from tests.golden.scene_fixtures import make_scene

FEAT = 16


def test_short_training_run_reduces_loss():
    cfg = MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=FEAT, dims=(64,) * 3,
                                    skip_in=(2,), multires=4),
            render=RenderConfig(feature_vector_size=FEAT, dims=(64,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=5, n_steps=20,
                                n_secant_steps=4, sample_chunk=0)),
        schedule=Schedule(),
        train=TrainConfig(batch_size=2, num_pixels=128, nepochs=30,
                          learning_rate=1e-3))

    scene = make_scene(n_images=2, n_pix=128, feat_ch=FEAT, seed=11,
                       sphere_radius=0.45)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    state = init_train_state(cfg, seed=0)
    step = make_train_step(cfg, phase_idx=0, donate=False)
    w = weights_to_array(cfg.schedule.weights(0.0))
    key = jax.random.PRNGKey(0)

    depth_losses = []
    for i in range(30):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, w, k)
        depth_losses.append(float(metrics["depth_loss"]))
    assert np.isfinite(depth_losses).all()
    # the depth maps encode a sphere of r=0.45 vs the r=0.6 geometric init:
    # the carving loss must pull the SDF toward it
    assert np.mean(depth_losses[-4:]) < 0.7 * np.mean(depth_losses[:4])
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()

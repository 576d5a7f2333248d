"""Quality regression (BASELINE config-2 analog without DTU data): optimize
the field on a synthetic multi-view sphere scene and require the extracted
mesh to reconstruct the analytic surface to sub-voxel chamfer."""
import numpy as np
import jax
import jax.numpy as jnp

from mvsdf_tpu.config import MVSDFConfig, ModelConfig, Schedule, TrainConfig
from mvsdf_tpu.fields.sdf import ImplicitConfig, sdf_apply
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                  weights_to_array)
from mvsdf_tpu.eval.marching import extract_mesh
from mvsdf_tpu.eval.psnr import chamfer_points

from tests.golden.scene_fixtures import make_scene

RADIUS = 0.45
FEAT = 16


def test_sphere_reconstruction_chamfer():
    cfg = MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=FEAT, dims=(64,) * 3,
                                    skip_in=(2,), multires=4, bias=0.6),
            render=RenderConfig(feature_vector_size=FEAT, dims=(64,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=6, n_steps=24,
                                n_secant_steps=4, sample_chunk=0)),
        schedule=Schedule(),
        train=TrainConfig(batch_size=4, num_pixels=192, nepochs=60,
                          learning_rate=1.2e-3))

    scene = make_scene(n_images=4, n_src=2, n_pix=192, feat_ch=FEAT,
                       seed=21, sphere_radius=RADIUS, img_hw=48,
                       depth_hw=24)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    state = init_train_state(cfg, seed=0)
    step = make_train_step(cfg, phase_idx=0, donate=False)
    w = weights_to_array(cfg.schedule.weights(0.0))
    key = jax.random.PRNGKey(0)
    for i in range(60):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, w, k)
    assert np.isfinite(float(metrics["loss"]))

    params = state.params

    def sdf(x):
        return sdf_apply(cfg.model.implicit, params["implicit"], x)

    verts, faces = extract_mesh(sdf, resolution=48)
    assert len(verts) > 300
    # analytic sphere samples
    rng = np.random.default_rng(0)
    s = rng.normal(size=(4000, 3))
    s = s / np.linalg.norm(s, axis=1, keepdims=True) * RADIUS
    ch = chamfer_points(verts, s)
    # grid step at res 48 is ~0.043; demand sub-voxel mean chamfer
    assert ch < 0.04, ch
    # radius error directly
    r = np.linalg.norm(verts, axis=1)
    assert abs(np.median(r) - RADIUS) < 0.02

"""Quality regression (BASELINE config-2 analog without DTU data): optimize
the field on a synthetic multi-view sphere scene (10 fibonacci-sphere
cameras, analytic depth maps) and require the zero level set to land on the
target surface with sub-voxel accuracy."""
import pytest
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
from mvsdf_tpu.eval.mesh import biggest_component
from mvsdf_tpu.eval.psnr import chamfer_points

from tests.golden.scene_fixtures import make_scene_fibonacci


pytestmark = pytest.mark.slow  # end-to-end reconstruction quality

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
        train=TrainConfig(batch_size=10, num_pixels=384, nepochs=300,
                          learning_rate=1e-4))

    scene = make_scene_fibonacci(n=10, n_pix=384, feat_ch=FEAT,
                                 sphere_radius=RADIUS)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    state = init_train_state(cfg, seed=0)
    step = make_train_step(cfg, phase_idx=0, donate=False)
    w = weights_to_array(cfg.schedule.weights(0.0))
    key = jax.random.PRNGKey(0)
    for _ in range(100):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, w, k)
    assert np.isfinite(float(metrics["loss"]))

    params = state.params

    def sdf(x):
        return sdf_apply(cfg.model.implicit, params["implicit"], x)

    # Evaluate inside the carving-supervised region: depth carving only
    # constrains sight-lines through the object (true for the reference
    # too); spurious off-silhouette surfaces are trimmed downstream by
    # RGB phases / mesh_cut on real scenes.
    verts, faces = extract_mesh(sdf, resolution=48, bounds=(-0.55, 0.55))
    verts, faces = biggest_component(verts, faces)
    assert len(verts) > 300
    # coverage: every part of the analytic sphere near the reconstruction
    rng = np.random.default_rng(0)
    s = rng.normal(size=(4000, 3))
    s = s / np.linalg.norm(s, axis=1, keepdims=True) * RADIUS
    from scipy.spatial import cKDTree
    d_s2m = cKDTree(verts).query(s, k=1)[0]
    assert np.percentile(d_s2m, 95) < 0.08, np.percentile(d_s2m, 95)
    # accuracy: the surface sits at the right radius
    keep = np.linalg.norm(verts, axis=1) < 0.54
    r = np.linalg.norm(verts[keep], axis=1)
    assert abs(np.median(r) - RADIUS) < 0.04, np.median(r)
    inlier = np.abs(r - RADIUS) < 0.08
    assert inlier.mean() > 0.8, inlier.mean()

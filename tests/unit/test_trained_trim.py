"""Mesh-trim threshold semantics on a TRAINED mesh (VERDICT r3 #6,
NOTES_ROUND2 #4).

The reference's default ``--thresh 15`` labels faces for removal when the
mean red vertex channel (= 1 - indicator sigmoid, ``plots.py:200-203``)
exceeds 15/255 — i.e. it keeps only faces whose indicator is confident
(sigmoid > ~0.94 modulo the max-flow smoothness term,
``mesh_cut/mesh_cut.py:8-35``). On an UNtrained mesh the indicator sits at
sigmoid ~0.5 everywhere and thresh 15 removes everything (why the old
pipeline smoke used 128). This test trains the indicator for real —
traced-hit points labeled 1, random eikonal points 0 (loss.py:167-174) —
and then characterizes the trained-mesh behavior at the reference default:
surface faces survive thresh 15, and removal counts are monotone in
thresh.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsdf_tpu.config import MVSDFConfig, ModelConfig, Schedule, TrainConfig
from mvsdf_tpu.fields.sdf import ImplicitConfig, implicit_apply
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.train.step import (init_train_state, make_train_step,
                                  weights_to_array)
from mvsdf_tpu.eval.marching import extract_mesh
from mvsdf_tpu.eval.mesh import biggest_component
from mvsdf_tpu.meshcut.cut import trim_mesh
from tests.golden.scene_fixtures import make_scene_fibonacci

pytestmark = pytest.mark.slow

RADIUS = 0.45


@pytest.fixture(scope="module")
def trained():
    cfg = MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=16, dims=(64,) * 4,
                                    skip_in=(2,), multires=4, bias=0.6),
            render=RenderConfig(feature_vector_size=16, dims=(64,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=8, n_steps=50,
                                n_secant_steps=6, sample_chunk=0,
                                fill_misses=False,
                                fallback_capacity_frac=0.9)),
        schedule=Schedule(),
        train=TrainConfig(batch_size=4, num_pixels=256, nepochs=300))
    sc = make_scene_fibonacci(n=8, img_hw=48, depth_hw=24, n_pix=256,
                              feat_ch=8, sphere_radius=RADIUS)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in sc.items()}

    state = init_train_state(cfg, seed=0)
    step = make_train_step(cfg, phase_idx=1, donate=False)
    tp = 0.5  # phase B: surf-indicator BCE active (conf.py:22-30 analog)
    w = weights_to_array(cfg.schedule.weights(tp))
    key = jax.random.PRNGKey(0)
    for e in range(300):
        key, k = jax.random.split(key)
        state = state._replace(epoch=jnp.asarray(e, jnp.int32))
        state, metrics = step(state, batch, w, k)
    assert np.isfinite(float(metrics["loss"]))

    icfg = cfg.model.implicit
    params = state.params

    def sdf(x):
        return np.asarray(implicit_apply(icfg, params["implicit"],
                                         jnp.asarray(x))[..., 0])

    verts, faces = extract_mesh(sdf, resolution=96, bounds=(-0.9, 0.9))
    verts, faces = biggest_component(verts, faces)
    logits = implicit_apply(icfg, params["implicit"],
                            jnp.asarray(verts, jnp.float32))[..., 1]
    surf = np.asarray(jax.nn.sigmoid(logits))
    colors = np.stack([1 - surf, surf, np.zeros_like(surf)], -1)
    return verts, faces, colors, surf


def test_trained_indicator_confident_on_surface(trained):
    verts, faces, colors, surf = trained
    r = np.linalg.norm(verts, axis=1)
    on_sphere = np.abs(r - RADIUS) < 0.08
    assert on_sphere.mean() > 0.5, "mesh did not converge to the sphere"
    # the BCE (hits -> 1) must push the on-surface indicator confident
    assert np.median(surf[on_sphere]) > 0.94, (
        f"indicator not confident on the trained surface: "
        f"median sigmoid {np.median(surf[on_sphere]):.3f}")


def test_reference_default_thresh_keeps_trained_surface(trained):
    verts, faces, colors, surf = trained
    v15, f15, _ = trim_mesh(verts, faces, colors, thresh=15.0, smooth=10)
    v128, f128, _ = trim_mesh(verts, faces, colors, thresh=128.0, smooth=10)
    kept15, kept128 = len(f15), len(f128)
    assert kept15 > 0, "thresh 15 removed the whole trained mesh"
    # monotone: a higher threshold labels fewer faces for removal
    assert kept128 >= kept15
    # the reference default keeps the (confident) trained surface: faces on
    # the analytic sphere survive in the majority
    c15 = v15[f15].mean(axis=1)
    on = np.abs(np.linalg.norm(c15, axis=1) - RADIUS) < 0.08
    total_on = np.abs(np.linalg.norm(
        verts[faces].mean(axis=1), axis=1) - RADIUS) < 0.08
    assert on.sum() > 0.7 * total_on.sum(), (
        f"thresh 15 kept only {on.sum()}/{total_on.sum()} surface faces")


def test_untrained_indicator_nuked_at_default_thresh(trained):
    """The flip side that motivated the old smoke's thresh=128: an
    indicator at sigmoid ~0.5 (red ~0.5 > 15/255) is fully removed at the
    reference default — characterizing why thresh 15 only makes sense on
    trained meshes."""
    verts, faces, _, _ = trained
    colors_unconf = np.full((len(verts), 3), 0.5)
    _, f15, _ = trim_mesh(verts, faces, colors_unconf, thresh=15.0,
                          smooth=10)
    assert len(f15) == 0

"""Phase-A depth-surface sampling behavior (statistical; the reference's
np.random.choice draw cannot be replayed bit-exactly)."""
import numpy as np
import jax
import jax.numpy as jnp

from mvsdf_tpu.config import ModelConfig
from mvsdf_tpu.fields.sdf import ImplicitConfig
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.rendering.renderer import _dsurf_samples, _sample_masked

from tests.golden.scene_fixtures import make_scene


def _cfg():
    return ModelConfig(
        implicit=ImplicitConfig(feature_vector_size=16, dims=(32,) * 2,
                                skip_in=()),
        render=RenderConfig(feature_vector_size=16, dims=(32,)),
        tracer=TracerConfig())


def test_dsurf_points_lie_on_depth_surface():
    scene = make_scene(n_images=2, n_pix=32, feat_ch=16, seed=4,
                       sphere_radius=0.5)
    inputs = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    on, on_ok, ji, ji_ok = _dsurf_samples(_cfg(), inputs, 256,
                                          jax.random.PRNGKey(0), None)
    on = np.asarray(on)[np.asarray(on_ok)]
    # unprojected depth points are on the r=0.5 sphere (unit coords = world
    # here since size=2, center=0)
    r = np.linalg.norm(on, axis=-1)
    assert np.abs(r - 0.5).max() < 0.02
    ji = np.asarray(ji)[np.asarray(ji_ok)]
    rj = np.linalg.norm(ji, axis=-1)
    # jittered copy within +-0.1 box of the surface
    assert (np.abs(rj - 0.5) < 0.18).all()
    assert np.abs(rj - 0.5).mean() > 0.01  # actually jittered


def test_sample_masked_uniform_without_replacement():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(1000, 3)), jnp.float32)
    valid = jnp.asarray(np.arange(1000) < 700)
    p, ok = _sample_masked(pts, valid, 200, jax.random.PRNGKey(1))
    assert bool(ok.all())
    # no duplicates
    u = np.unique(np.asarray(p), axis=0)
    assert len(u) == 200
    # statistically uniform over the valid range: mean index ~ 350
    # (recover indices by matching rows)
    # quick proxy: all sampled rows must come from the valid prefix
    src = np.asarray(pts[:700])
    d = np.abs(np.asarray(p)[:, None, :] - src[None]).sum(-1).min(1)
    assert d.max() < 1e-6


def test_sample_masked_insufficient_valid_marks_invalid():
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(50, 3)),
                      jnp.float32)
    valid = jnp.asarray(np.arange(50) < 10)
    p, ok = _sample_masked(pts, valid, 30, jax.random.PRNGKey(2))
    assert int(ok.sum()) == 10

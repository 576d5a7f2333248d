"""Golden parity: our masked fixed-shape tracer vs the reference RayTracing
module on analytic SDFs (BASELINE config 1)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.golden.reference_harness import import_reference

import jax.numpy as jnp
from mvsdf_tpu.tracing import TracerConfig, trace_rays


@pytest.fixture(scope="module")
def ref():
    return import_reference()


CENTER = np.array([0.05, -0.08, 0.02], np.float32)
RADIUS = 0.55


def sdf_torch(x):
    return torch.linalg.norm(x - torch.from_numpy(CENTER), dim=-1) - RADIUS


def sdf_jax(x):
    return jnp.linalg.norm(x - jnp.asarray(CENTER), axis=-1) - RADIUS


def _scene(n=256, seed=0, spread=0.9):
    rng = np.random.default_rng(seed)
    cam = np.array([[0.1, 0.2, 2.2]], np.float32)
    targets = rng.uniform(-spread, spread, (1, n, 3)).astype(np.float32)
    dirs = targets - cam[:, None, :]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return cam, dirs


def _make_ref_tracer(ref, training):
    rt = ref["rt"].RayTracing(
        object_bounding_sphere=1.0, sdf_threshold=5.0e-5,
        line_search_step=0.5, line_step_iters=3, sphere_tracing_iters=10,
        n_steps=100, n_secant_steps=8)
    rt.train(training)
    return rt


@pytest.mark.parametrize("training", [False, True])
def test_trace_parity(ref, training):
    cam, dirs = _scene()
    n = dirs.shape[1]
    om_np = np.ones((n,), bool)
    rt = _make_ref_tracer(ref, training)

    torch.manual_seed(7)
    with torch.no_grad():
        ref_pts, ref_mask, ref_dists = rt(
            sdf=sdf_torch,
            cam_loc=torch.from_numpy(cam),
            object_mask=torch.from_numpy(om_np),
            ray_directions=torch.from_numpy(dirs))
    # Reproduce the reference's random stratified steps (single uniform draw).
    torch.manual_seed(7)
    steps = torch.empty(100).uniform_(0.0, 1.0).numpy()

    cfg = TracerConfig()
    org = np.tile(cam, (dirs.shape[1], 1))
    res = trace_rays(cfg, sdf_jax, jnp.asarray(org), jnp.asarray(dirs[0]),
                     jnp.asarray(om_np), training=training,
                     minimal_steps=jnp.asarray(steps))

    np.testing.assert_array_equal(np.asarray(res.network_object_mask),
                                  ref_mask.numpy())
    # Min-SDF picks on flat minima may flip between adjacent samples under
    # float reordering; allow a tiny fraction of spacing-bounded deviations.
    err = np.abs(np.asarray(res.dists) - ref_dists.numpy())
    assert (err > 2e-4).mean() < 0.02
    assert err.max() < 5e-2
    perr = np.abs(np.asarray(res.points) - ref_pts.numpy()).max(-1)
    assert (perr > 3e-4).mean() < 0.02
    assert perr.max() < 5e-2


def test_trace_parity_with_partial_mask(ref):
    cam, dirs = _scene(n=200, seed=5)
    n = dirs.shape[1]
    rng = np.random.default_rng(1)
    om_np = rng.uniform(size=n) < 0.6
    rt = _make_ref_tracer(ref, True)
    torch.manual_seed(11)
    with torch.no_grad():
        ref_pts, ref_mask, ref_dists = rt(
            sdf=sdf_torch, cam_loc=torch.from_numpy(cam),
            object_mask=torch.from_numpy(om_np),
            ray_directions=torch.from_numpy(dirs))
    torch.manual_seed(11)
    steps = torch.empty(100).uniform_(0.0, 1.0).numpy()
    cfg = TracerConfig()
    org = np.tile(cam, (dirs.shape[1], 1))
    res = trace_rays(cfg, sdf_jax, jnp.asarray(org), jnp.asarray(dirs[0]),
                     jnp.asarray(om_np), training=True,
                     minimal_steps=jnp.asarray(steps))
    np.testing.assert_array_equal(np.asarray(res.network_object_mask),
                                  ref_mask.numpy())
    # Min-SDF picks on flat minima may flip between adjacent samples under
    # float reordering; allow a tiny fraction of spacing-bounded deviations.
    err = np.abs(np.asarray(res.dists) - ref_dists.numpy())
    assert (err > 2e-4).mean() < 0.02
    assert err.max() < 5e-2

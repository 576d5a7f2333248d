"""Golden tests: our fields vs the PyTorch reference on CPU (BASELINE
config 1 family). Weights are copied from a torch-initialized reference
network into our param pytrees; outputs and gradients must be allclose."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.golden.reference_harness import (import_reference,
                                            torch_implicit_to_params)

import jax.numpy as jnp
from mvsdf_tpu.fields.sdf import (ImplicitConfig, implicit_apply,
                                  sdf_value_and_grad)
from mvsdf_tpu.fields.radiance import RenderConfig, render_apply


@pytest.fixture(scope="module")
def ref():
    return import_reference()


def _small_ref_implicit(ref, multires=6):
    torch.manual_seed(0)
    return ref["idr"].ImplicitNetwork(
        feature_vector_size=32, d_in=3, d_out=1,
        dims=[64, 64, 64, 64], geometric_init=True, bias=0.6,
        skip_in=[2], weight_norm=True, multires=multires)


def test_implicit_forward_parity(ref):
    net = _small_ref_implicit(ref)
    cfg = ImplicitConfig(feature_vector_size=32, dims=(64,) * 4, skip_in=(2,),
                         bias=0.6, multires=6)
    params = torch_implicit_to_params(net)
    x = np.random.default_rng(0).uniform(-0.9, 0.9, (64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()
    ours = np.asarray(implicit_apply(cfg, params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=1e-4)


def test_implicit_full_size_forward_parity(ref):
    torch.manual_seed(1)
    net = ref["idr"].ImplicitNetwork(
        feature_vector_size=256, d_in=3, d_out=1, dims=[512] * 8,
        geometric_init=True, bias=0.6, skip_in=[4], weight_norm=True,
        multires=6)
    cfg = ImplicitConfig()
    params = torch_implicit_to_params(net)
    x = np.random.default_rng(1).uniform(-1, 1, (32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()
    ours = np.asarray(implicit_apply(cfg, params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, atol=5e-5, rtol=1e-4)


def test_spatial_gradient_parity(ref):
    net = _small_ref_implicit(ref)
    cfg = ImplicitConfig(feature_vector_size=32, dims=(64,) * 4, skip_in=(2,),
                         multires=6)
    params = torch_implicit_to_params(net)
    x = np.random.default_rng(2).uniform(-0.9, 0.9, (32, 3)).astype(np.float32)
    g_ref = net.gradient(torch.from_numpy(x)).detach().numpy()[:, 0, :]
    _, g = sdf_value_and_grad(cfg, params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), g_ref, atol=2e-5, rtol=1e-4)


def test_param_gradient_of_eikonal_parity(ref):
    """d/dtheta of the eikonal loss must match the reference's
    double-backprop (create_graph=True) route."""
    net = _small_ref_implicit(ref)
    cfg = ImplicitConfig(feature_vector_size=32, dims=(64,) * 4, skip_in=(2,),
                         multires=6)
    params = torch_implicit_to_params(net)
    x = np.random.default_rng(3).uniform(-0.8, 0.8, (16, 3)).astype(np.float32)

    g_t = net.gradient(torch.from_numpy(x))[:, 0, :]
    loss_t = ((g_t.norm(2, dim=1) - 1) ** 2).mean()
    loss_t.backward()
    # reference grad for layer-0 weight_v
    lin0 = net.lin0
    ref_gv = lin0.weight_v.grad.detach().numpy()

    import jax

    def loss_fn(p):
        _, g = sdf_value_and_grad(cfg, p, jnp.asarray(x))
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1) ** 2)

    grads = jax.grad(loss_fn)(params)
    ours_gv = np.asarray(grads[0]["v"]).T  # back to (out, in)
    np.testing.assert_allclose(ours_gv, ref_gv, atol=1e-5, rtol=1e-3)
    np.testing.assert_allclose(float(loss_fn(params)),
                               float(loss_t.detach()), rtol=1e-5)


def test_rendering_network_parity(ref):
    torch.manual_seed(4)
    net = ref["idr"].RenderingNetwork(
        feature_vector_size=32, mode="idr", d_in=9, d_out=3,
        dims=[64, 64], weight_norm=True, multires_view=4)
    cfg = RenderConfig(feature_vector_size=32, dims=(64, 64), multires_view=4)
    params = torch_implicit_to_params(net)
    rng = np.random.default_rng(5)
    n = 17
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    views = rng.normal(size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 32)).astype(np.float32)
    with torch.no_grad():
        ref_rgb = net(*map(torch.from_numpy,
                           (pts, normals, views, feats))).numpy()
    ours = np.asarray(render_apply(cfg, params, jnp.asarray(pts),
                                   jnp.asarray(normals), jnp.asarray(views),
                                   jnp.asarray(feats)))
    np.testing.assert_allclose(ours, ref_rgb, atol=2e-5, rtol=1e-4)

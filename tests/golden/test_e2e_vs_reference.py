"""End-to-end golden test (BASELINE config 1): full renderer forward +
five-term loss + parameter gradients vs the PyTorch reference, on a synthetic
scene at train_progress=0.3 (phase B: no depth-surface sampling, so the only
randomness — minimal-SDF steps and eikonal points — can be replayed exactly).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.golden.reference_harness import (import_reference,
                                            torch_implicit_to_params)
from tests.golden.scene_fixtures import make_scene

import jax
import jax.numpy as jnp

from mvsdf_tpu.config import ModelConfig, Schedule
from mvsdf_tpu.fields.sdf import ImplicitConfig
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.rendering import render_forward
from mvsdf_tpu.supervision.losses import total_loss

TP = 0.3
FEAT = 32


class _Conf:
    d = {
        "feature_vector_size": FEAT,
        "implicit_network": dict(d_in=3, d_out=1, dims=[64, 64, 64, 64],
                                 geometric_init=True, bias=0.6, skip_in=[2],
                                 weight_norm=True, multires=6),
        "rendering_network": dict(mode="idr", d_in=9, d_out=3, dims=[64, 64],
                                  weight_norm=True, multires_view=4),
        "ray_tracer": dict(object_bounding_sphere=1.0, sdf_threshold=5.0e-5,
                           line_search_step=0.5, line_step_iters=3,
                           sphere_tracing_iters=10, n_steps=100,
                           n_secant_steps=8),
    }

    def get_int(self, k):
        return self.d[k]

    def get_float(self, k):
        parts = k.split(".")
        v = self.d
        for p in parts:
            v = v[p] if isinstance(v, dict) else getattr(v, p)
        return float(v)

    def get_config(self, k):
        return self.d[k]


@pytest.fixture(scope="module")
def setup():
    ref = import_reference()
    torch.manual_seed(0)
    model = ref["idr"].IDRNetwork(conf=_Conf())
    model.train()
    loss_mod = ref["loss"].IDRLoss()
    scene = make_scene(n_images=2, n_pix=64, feat_ch=FEAT, seed=3)
    params = {
        "implicit": torch_implicit_to_params(model.implicit_network),
        "render": torch_implicit_to_params(model.rendering_network),
    }
    cfg = ModelConfig(
        implicit=ImplicitConfig(feature_vector_size=FEAT, dims=(64,) * 4,
                                skip_in=(2,), bias=0.6, multires=6),
        render=RenderConfig(feature_vector_size=FEAT, dims=(64, 64),
                            multires_view=4),
        tracer=TracerConfig(),
        implicit_diff_min_dot=0.0)  # reference divides unguarded
    return ref, model, loss_mod, scene, params, cfg


def _run_reference(ref, model, loss_mod, scene, seed=21):
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in scene.items()}
    model_input = {k: t[k] for k in
                   ["uv", "intrinsics", "pose", "object_mask", "depths",
                    "depth_cams"]}
    model_input["size"] = t["size"]
    model_input["center"] = t["center"]
    gt = {k: t[k] for k in ["rgb", "depths", "depth_cams", "size", "center",
                            "feat", "feat_src", "cam", "src_cams"]}
    torch.manual_seed(seed)
    out = model(model_input, TP)
    losses = loss_mod(out, gt, TP, 2)
    # replay the reference's random draws: the trace's minimal-SDF steps
    # come first, then the eikonal cube points (renderer :218).
    B, P = scene["uv"].shape[:2]
    torch.manual_seed(seed)
    steps = torch.empty(100).uniform_(0.0, 1.0).numpy()
    eik = torch.empty(B * P // 2, 3).uniform_(-1.0, 1.0).numpy()
    return out, losses, steps, eik


def _run_ours(scene, params, cfg, steps, eik):
    sched = Schedule()
    gates = sched.gates(TP)
    weights = sched.weights(TP)
    inputs = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    noise = {"minimal_steps": jnp.asarray(steps),
             "eik_points": jnp.asarray(eik)}

    def loss_fn(p):
        out = render_forward(cfg, p, inputs, training=True, gates=gates,
                             noise=noise)
        gt = {k: inputs[k] for k in
              ["rgb", "depths", "depth_cams", "size", "center", "feat",
               "feat_src", "cam", "src_cams"]}
        lt = total_loss(out, gt, gates, sched, weights)
        return lt.loss, (out, lt)

    (loss_val, (out, lt)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    return out, lt, grads


def test_forward_parity(setup):
    ref, model, loss_mod, scene, params, cfg = setup
    ref_out, ref_losses, steps, eik = _run_reference(ref, model, loss_mod,
                                                     scene)
    out, lt, grads = _run_ours(scene, params, cfg, steps, eik)

    np.testing.assert_array_equal(
        np.asarray(out.network_object_mask).reshape(-1),
        ref_out["network_object_mask"].detach().numpy())
    np.testing.assert_allclose(np.asarray(out.points).reshape(-1, 3),
                               ref_out["points"].detach().numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.sdf_output).reshape(-1),
                               ref_out["sdf_output"].detach().numpy()[:, 0],
                               atol=5e-4)
    hit = np.asarray(out.surface_mask).reshape(-1)
    np.testing.assert_allclose(
        np.asarray(out.rgb_values).reshape(-1, 3)[hit],
        ref_out["rgb_values"].detach().numpy()[hit], atol=1e-3)


def test_loss_parity(setup):
    ref, model, loss_mod, scene, params, cfg = setup
    _, ref_losses, steps, eik = _run_reference(ref, model, loss_mod, scene)
    _, lt, _ = _run_ours(scene, params, cfg, steps, eik)
    for name, ours in [("rgb_loss", lt.rgb_loss),
                       ("eikonal_loss", lt.eikonal_loss),
                       ("depth_loss", lt.depth_loss),
                       ("feat_loss", lt.feat_loss),
                       ("surf_loss", lt.surf_loss),
                       ("loss", lt.loss)]:
        ref_v = float(ref_losses[name].detach())
        assert abs(float(ours) - ref_v) < 2e-3 + 1e-3 * abs(ref_v), \
            f"{name}: ours={float(ours)} ref={ref_v}"


def test_param_gradient_parity(setup):
    ref, model, loss_mod, scene, params, cfg = setup
    _, ref_losses, steps, eik = _run_reference(ref, model, loss_mod, scene)
    model.zero_grad()
    ref_losses["loss"].backward()
    _, _, grads = _run_ours(scene, params, cfg, steps, eik)

    for net_name, torch_net in [("implicit", model.implicit_network),
                                ("render", model.rendering_network)]:
        for l, layer_grads in enumerate(grads[net_name]):
            lin = getattr(torch_net, f"lin{l}")
            ref_gv = lin.weight_v.grad
            if ref_gv is None:
                continue
            ref_gv = ref_gv.detach().numpy()
            ours_gv = np.asarray(layer_grads["v"]).T
            scale = np.abs(ref_gv).max() + 1e-8
            np.testing.assert_allclose(
                ours_gv / scale, ref_gv / scale, atol=5e-3,
                err_msg=f"{net_name} layer {l} weight_v grad")

"""Full-size end-to-end golden parity (slow): one forward + five-term loss +
parameter-gradient comparison vs the PyTorch reference at the REFERENCE
architecture and batch shapes — batch 8 x 4096 rays, implicit 8x512 with skip
at 4 / multires 6 / feature 256, rendering 4x512 with multires_view 4
(``code/confs/mvsdf_dtu.conf:20-39``), train_progress in phase B.

The small e2e golden (test_e2e_vs_reference.py) runs a 64-wide toy net;
width-sensitive numerics (softplus saturation, weight-norm scale, f32
accumulation across 512 lanes) only show up at full width, so this test is
the one that certifies the production configuration. ~2-5 min on CPU; run
with --runslow.
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

pytestmark = pytest.mark.slow

TP = 0.3
FEAT = 256   # MLP feature head width (mvsdf_dtu.conf:21)
FMAP = 32    # frozen CNN feature-map channels
B, P = 8, 4096


class _FullConf:
    d = {
        "feature_vector_size": FEAT,
        "implicit_network": dict(d_in=3, d_out=1, dims=[512] * 8,
                                 geometric_init=True, bias=0.6, skip_in=[4],
                                 weight_norm=True, multires=6),
        "rendering_network": dict(mode="idr", d_in=9, d_out=3,
                                  dims=[512] * 4, weight_norm=True,
                                  multires_view=4),
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
def full_runs():
    ref = import_reference()
    torch.manual_seed(0)
    torch.set_num_threads(4)
    model = ref["idr"].IDRNetwork(conf=_FullConf())
    model.train()
    loss_mod = ref["loss"].IDRLoss()
    scene = make_scene(n_images=B, n_pix=P, feat_ch=FMAP, seed=3)
    params = {
        "implicit": torch_implicit_to_params(model.implicit_network),
        "render": torch_implicit_to_params(model.rendering_network),
    }
    cfg = ModelConfig(
        implicit=ImplicitConfig(feature_vector_size=FEAT, dims=(512,) * 8,
                                skip_in=(4,), bias=0.6, multires=6),
        render=RenderConfig(feature_vector_size=FEAT, dims=(512,) * 4,
                            multires_view=4),
        tracer=TracerConfig(),
        implicit_diff_min_dot=0.0)

    # --- reference forward + loss + backward ------------------------------
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in scene.items()}
    model_input = {k: t[k] for k in
                   ["uv", "intrinsics", "pose", "object_mask", "depths",
                    "depth_cams", "size", "center"]}
    gt = {k: t[k] for k in ["rgb", "depths", "depth_cams", "size", "center",
                            "feat", "feat_src", "cam", "src_cams"]}
    seed = 21
    torch.manual_seed(seed)
    ref_out = model(model_input, TP)
    ref_losses = loss_mod(ref_out, gt, TP, B)
    model.zero_grad()
    ref_losses["loss"].backward()

    # replay the reference's draws (trace minimal-SDF steps, then eikonal)
    torch.manual_seed(seed)
    steps = torch.empty(100).uniform_(0.0, 1.0).numpy()
    eik = torch.empty(B * P // 2, 3).uniform_(-1.0, 1.0).numpy()
    noise = {"minimal_steps": jnp.asarray(steps),
             "eik_points": jnp.asarray(eik)}

    # --- ours --------------------------------------------------------------
    sched = Schedule()
    gates = sched.gates(TP)
    weights = sched.weights(TP)
    inputs = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    def loss_fn(p):
        out = render_forward(cfg, p, inputs, training=True, gates=gates,
                             noise=noise)
        gtj = {k: inputs[k] for k in
               ["rgb", "depths", "depth_cams", "size", "center", "feat",
                "feat_src", "cam", "src_cams"]}
        lt = total_loss(out, gtj, gates, sched, weights)
        return lt.loss, (out, lt)

    (_, (out, lt)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    return ref, model, ref_out, ref_losses, out, lt, grads


def test_fullsize_forward_parity(full_runs):
    """Point/mask/RGB parity with a PRINCIPLED knife-edge account.

    At full width the two engines' f32 SDF evaluations differ by reduction
    order (~5e-7 at |sdf|~1e-2 here); two discrete decisions in the tracer
    legitimately flip under that noise (measured + root-caused in
    scripts/debug_fullsize_parity.py, NOTES_ROUND4):

      * min-SDF fill rays (ref ray_tracing.py:280-308): argmin over 100
        samples with near-equal values picks a neighboring sample — the
        point moves by ~one sample spacing. These lanes are additionally
        DEAD in the training step (tests/unit/test_fill_skip.py proves
        losses+gradients are bit-identical with the fill skipped).
      * grazing-ray secant roots (ref :260-278): where the SDF slope along
        the ray is tiny, the root position is ill-conditioned — dz ~
        eval_noise / slope reaches ~1e-3.

    Bit-tight f32 cross-engine equality at those rays is unattainable by
    ANY correct implementation, so each flagged ray is instead verified
    against the functional criterion of its stage using the REFERENCE's own
    SDF: a hit point must be a root (residual comparable to the reference's
    own secant residual), a fill point must attain the reference's min-SDF
    value up to engine noise. Unflagged rays (>99.5% required) stay at the
    original tight tolerance. A genuine sampler/secant divergence would
    show up as mask mismatches, a flagged fraction above the cap, or
    flagged points failing their residual/min-gap criterion.
    """
    _, model, ref_out, _, out, _, _ = full_runs
    np.testing.assert_array_equal(
        np.asarray(out.network_object_mask).reshape(-1),
        ref_out["network_object_mask"].detach().numpy())

    ours_p = np.asarray(out.points).reshape(-1, 3)
    ref_p = ref_out["points"].detach().numpy()
    hit = ref_out["network_object_mask"].detach().numpy()

    def sdf_t(pts_np):
        with torch.no_grad():
            return model.implicit_network(
                torch.from_numpy(pts_np.astype(np.float32)))[:, 0].numpy()

    # Engine eval-noise scale: torch-vs-jax f32 disagreement at identical
    # points, measured on a subsample of the reference's own points.
    from mvsdf_tpu.fields.sdf import sdf_apply
    icfg = ImplicitConfig(feature_vector_size=FEAT, dims=(512,) * 8,
                          skip_in=(4,), bias=0.6, multires=6)
    params_i = torch_implicit_to_params(model.implicit_network)
    sub = ref_p[:: max(1, len(ref_p) // 4096)]
    noise = float(np.abs(np.asarray(sdf_apply(icfg, params_i,
                                              jnp.asarray(sub)))
                         - sdf_t(sub)).max())
    eps = max(32.0 * noise, 1e-5)

    dmax = np.abs(ours_p - ref_p).max(-1)
    flagged = dmax > 1e-3
    # the knife edge moves a point by at most ~a few sample spacings
    assert dmax.max() < 0.05, f"divergence too large: {dmax.max()}"
    assert flagged.mean() < 0.005, \
        f"{flagged.sum()} rays flagged (>{0.005:.1%})"

    fl_hit = flagged & hit
    if fl_hit.any():
        res_ours = np.abs(sdf_t(ours_p[fl_hit]))
        res_ref = np.abs(sdf_t(ref_p[fl_hit]))
        bad = res_ours > np.maximum(8.0 * res_ref, eps)
        assert not bad.any(), (
            f"{bad.sum()} flagged hit rays are not knife-edge roots: "
            f"residual_ours={res_ours[bad][:5]} vs ref={res_ref[bad][:5]}")
    fl_miss = flagged & ~hit
    if fl_miss.any():
        gap = sdf_t(ours_p[fl_miss]) - sdf_t(ref_p[fl_miss])
        assert gap.max() <= eps, (
            f"flagged miss rays are not co-minimal: max gap {gap.max()} "
            f"> eps {eps}")

    ok = ~flagged
    np.testing.assert_allclose(ours_p[ok], ref_p[ok], atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out.sdf_output).reshape(-1)[ok],
        ref_out["sdf_output"].detach().numpy()[:, 0][ok], atol=1e-3)
    hit_ok = np.asarray(out.surface_mask).reshape(-1) & ok
    np.testing.assert_allclose(
        np.asarray(out.rgb_values).reshape(-1, 3)[hit_ok],
        ref_out["rgb_values"].detach().numpy()[hit_ok], atol=2e-3)


def test_fullsize_loss_parity(full_runs):
    _, _, _, ref_losses, _, lt, _ = full_runs
    for name, ours in [("rgb_loss", lt.rgb_loss),
                       ("eikonal_loss", lt.eikonal_loss),
                       ("depth_loss", lt.depth_loss),
                       ("feat_loss", lt.feat_loss),
                       ("surf_loss", lt.surf_loss),
                       ("loss", lt.loss)]:
        ref_v = float(ref_losses[name].detach())
        assert abs(float(ours) - ref_v) < 3e-3 + 2e-3 * abs(ref_v), \
            f"{name}: ours={float(ours)} ref={ref_v}"


def test_fullsize_param_gradient_parity(full_runs):
    _, model, _, _, _, _, grads = full_runs
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
                ours_gv / scale, ref_gv / scale, atol=1e-2,
                err_msg=f"{net_name} layer {l} weight_v grad")

"""Golden parity of the eval-mode (serving) renderer branch: tracing only,
no miss filling, surface points used directly
(ref implicit_differentiable_renderer.py:295-304)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.golden.reference_harness import (import_reference,
                                            torch_implicit_to_params)
from tests.golden.scene_fixtures import make_scene
from tests.golden.test_e2e_vs_reference import _Conf, FEAT

import jax.numpy as jnp

from mvsdf_tpu.config import ModelConfig
from mvsdf_tpu.fields.sdf import ImplicitConfig
from mvsdf_tpu.fields.radiance import RenderConfig
from mvsdf_tpu.tracing.sphere_trace import TracerConfig
from mvsdf_tpu.rendering import render_forward


def test_eval_forward_parity():
    ref = import_reference()
    torch.manual_seed(0)
    model = ref["idr"].IDRNetwork(conf=_Conf())
    model.eval()
    scene = make_scene(n_images=1, n_pix=96, feat_ch=FEAT, seed=9)
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

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in scene.items()}
    model_input = {k: t[k] for k in ["uv", "intrinsics", "pose",
                                     "object_mask"]}
    # the reference's eval path still runs autograd internally for normals
    # (gradient() in get_rbg_value), so no torch.no_grad here
    ref_out = model(model_input)
    ref_out = {k: (v.detach() if torch.is_tensor(v) else v)
               for k, v in ref_out.items()}

    inputs = {k: jnp.asarray(np.asarray(scene[k])) for k in
              ["uv", "intrinsics", "pose", "object_mask"]}
    out = render_forward(cfg, params, inputs, training=False)

    np.testing.assert_array_equal(
        np.asarray(out.network_object_mask).reshape(-1),
        ref_out["network_object_mask"].numpy())
    hit = np.asarray(out.network_object_mask).reshape(-1)
    np.testing.assert_allclose(
        np.asarray(out.rgb_values).reshape(-1, 3)[hit],
        ref_out["rgb_values"].numpy()[hit], atol=1e-3)
    # non-hit rays get RGB = 1 (ref :302-304)
    if (~hit).any():
        assert np.allclose(
            np.asarray(out.rgb_values).reshape(-1, 3)[~hit], 1.0)

"""Fail-loud divisibility checks for the ray axis (VERDICT r1 weak #5):
remainder rays must raise, not silently drop."""
import jax
import numpy as np
import pytest

from mvsdf_tpu.parallel.sharding import (host_ray_slice,
                                         validate_ray_divisibility)


def test_host_ray_slice_single_process_ok():
    s = host_ray_slice(4096)
    assert s == slice(0, 4096)


def test_validate_rejects_mesh_remainder():
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs >1 device")
    from mvsdf_tpu.parallel import make_mesh
    mesh = make_mesh(n)
    with pytest.raises(ValueError, match="not divisible by mesh size"):
        validate_ray_divisibility(n * 7 + 1, mesh)
    validate_ray_divisibility(n * 8, mesh)  # exact split passes


def test_trainer_rejects_mesh_remainder(tmp_path):
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs >1 device")
    from mvsdf_tpu.parallel import make_mesh
    from mvsdf_tpu.config import (MVSDFConfig, ModelConfig, Schedule,
                                  TrainConfig)
    from mvsdf_tpu.fields.sdf import ImplicitConfig
    from mvsdf_tpu.fields.radiance import RenderConfig
    from mvsdf_tpu.tracing.sphere_trace import TracerConfig
    from mvsdf_tpu.train.loop import Trainer

    class FakeScene:
        n_images = 4
        poses = np.zeros((4, 4, 4), np.float32)

    cfg = MVSDFConfig(
        model=ModelConfig(
            implicit=ImplicitConfig(feature_vector_size=8, dims=(16,),
                                    skip_in=(), multires=2),
            render=RenderConfig(feature_vector_size=8, dims=(16,),
                                multires_view=2),
            tracer=TracerConfig(sphere_tracing_iters=2, n_steps=8,
                                n_secant_steps=2, sample_chunk=0)),
        schedule=Schedule(),
        train=TrainConfig(batch_size=2, num_pixels=n * 3 + 1, nepochs=2))
    with pytest.raises(ValueError, match="not divisible by mesh size"):
        Trainer(cfg, FakeScene(), str(tmp_path / "exp"),
                mesh=make_mesh(n))

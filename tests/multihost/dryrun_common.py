"""Shared tiny-model fused-dispatch runner for multihost tests.

Builds the same small config/scene as __graft_entry__.dryrun_multichip
(XLA trace path) and runs K fused scan steps over a given mesh, returning
the per-step losses. Used both in-process (single-controller, simulated
devices) and from the real two-process jax.distributed worker."""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def run_tiny_scan(mesh, n_pix=64, use_pallas=False):
    import jax
    import jax.numpy as jnp
    from mvsdf_tpu.config import (MVSDFConfig, ModelConfig, Schedule,
                                  TrainConfig)
    from mvsdf_tpu.fields.sdf import ImplicitConfig
    from mvsdf_tpu.fields.radiance import RenderConfig
    from mvsdf_tpu.tracing.sphere_trace import TracerConfig
    from mvsdf_tpu.train.step import (make_scan_train_step,
                                      init_train_state, weights_to_array)
    from mvsdf_tpu.train.device_data import DeviceSceneCache
    from mvsdf_tpu.parallel.sharding import replicated
    from tests.golden.scene_fixtures import make_scene
    from __graft_entry__ import _FakeScene

    feat = 16
    batch_size = 2
    n_images = 3
    model = ModelConfig(
        implicit=ImplicitConfig(feature_vector_size=feat, dims=(64,) * 3,
                                skip_in=(2,), multires=6),
        render=RenderConfig(feature_vector_size=feat, dims=(64,),
                            multires_view=4),
        tracer=TracerConfig(sphere_tracing_iters=5, n_steps=20,
                            n_secant_steps=4, sample_chunk=0,
                            sampler_capacity_frac=0.9,
                            fill_capacity_frac=0.9,
                            fallback_capacity_frac=0.9),
        shard_map_trace=True, use_pallas_trace=use_pallas,
        pallas_interpret=use_pallas)
    cfg = MVSDFConfig(model=model, schedule=Schedule(),
                      train=TrainConfig(batch_size=batch_size,
                                        num_pixels=n_pix, nepochs=12))
    scene = make_scene(n_images=n_images, n_pix=n_pix, feat_ch=feat,
                       depth_hw=24, img_hw=48)
    scene = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    state = init_train_state(cfg, seed=0)
    cache = DeviceSceneCache(_FakeScene(scene), mesh=mesh)
    scan = make_scan_train_step(cfg, phase_idx=1, cache=cache, mesh=mesh,
                                donate=False)
    K = 2
    rng = np.random.default_rng(0)
    idx = np.stack([rng.permutation(n_images)[:batch_size]
                    for _ in range(K)]).astype(np.int32)
    sel = np.stack([rng.permutation(np.asarray(cache.uv).shape[0])[:n_pix]
                    for _ in range(K)]).astype(np.int32)
    w = np.tile(np.asarray(weights_to_array(cfg.schedule.weights(0.3))),
                (K, 1))
    epochs = np.arange(K, dtype=np.int32)
    keys = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(K)])
    active = np.ones(K, bool)
    repl = replicated(mesh)
    args = tuple(jax.device_put(jnp.asarray(a), repl)
                 for a in (idx, sel, w, epochs, keys, active))
    state = jax.device_put(state, repl)
    state, metrics = scan(state, *args)
    loss = metrics["loss"]
    # fully-replicated global array: every process can read shard 0
    return np.asarray(jax.device_get(
        loss.addressable_data(0) if hasattr(loss, "addressable_data")
        else loss)).reshape(-1)


def run_fullsize_step(mesh):
    """ONE fused scan step at PRODUCTION shapes (batch 8 x 4096 rays,
    512x8 implicit net, 10/100/8 tracer, fill-skip trace — the execution
    model of ref idr_train.py:253-315 at mvsdf_dtu.conf shapes) over the
    given mesh. Returns (loss, grad_norm) floats. Used by the two-process
    jax.distributed test to cover the DCN-analog boundary at full size
    (VERDICT r3 #7): non-addressable devices + replicated upload of the
    full-size scene cache."""
    import jax
    import jax.numpy as jnp
    from mvsdf_tpu.config import (MVSDFConfig, ModelConfig, Schedule,
                                  TrainConfig)
    from mvsdf_tpu.tracing.sphere_trace import TracerConfig
    from mvsdf_tpu.train.step import (make_scan_train_step,
                                      init_train_state, weights_to_array)
    from mvsdf_tpu.train.device_data import DeviceSceneCache
    from mvsdf_tpu.parallel.sharding import replicated
    from tests.golden.scene_fixtures import make_scene
    from __graft_entry__ import _FakeScene

    model = ModelConfig(tracer=TracerConfig(fill_misses=False),
                        shard_map_trace=True)
    cfg = MVSDFConfig(model=model, schedule=Schedule(),
                      train=TrainConfig(batch_size=8, num_pixels=4096,
                                        nepochs=12))
    scene = make_scene(n_images=12, n_pix=4096, feat_ch=32, depth_hw=48,
                       img_hw=96)
    scene = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}

    state = init_train_state(cfg, seed=0)
    cache = DeviceSceneCache(_FakeScene(scene), mesh=mesh)
    scan = make_scan_train_step(cfg, phase_idx=1, cache=cache, mesh=mesh,
                                donate=False)
    rng = np.random.default_rng(0)
    idx = rng.permutation(12)[:8].astype(np.int32)[None]
    sel = rng.permutation(np.asarray(cache.uv).shape[0])[:4096].astype(
        np.int32)[None]
    w = np.asarray(weights_to_array(cfg.schedule.weights(0.3)))[None]
    epochs = np.zeros(1, np.int32)
    keys = np.asarray(jax.random.PRNGKey(0))[None]
    active = np.ones(1, bool)
    repl = replicated(mesh)
    args = tuple(jax.device_put(jnp.asarray(a), repl)
                 for a in (idx, sel, w, epochs, keys, active))
    state = jax.device_put(state, repl)
    state, metrics = scan(state, *args)

    def fetch(x):
        return float(np.asarray(jax.device_get(
            x.addressable_data(0) if hasattr(x, "addressable_data")
            else x)).reshape(-1)[0])

    return fetch(metrics["loss"]), fetch(metrics["grad_norm"])

"""Step-time decomposition on the bench fixture (TPU).

Timing methodology (IMPORTANT on the tunneled axon backend):
``jax.block_until_ready`` resolves without a device round trip there, and
independent dispatches whose results are never fetched can be elided
entirely — naive loops measure ~0 ms. Every measurement below therefore
CHAINS iterations (each call consumes a scalar derived from the previous
output) and ends with a host fetch, which forces the whole chain to
execute; per-call dispatch overhead amortizes away exactly like in
training.

Pieces timed at the bench configuration (pallas trace + fallback and
mid-march compaction): no-grad trace alone, render_forward, forward+loss,
value_and_grad, full optimizer step.
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITERS = 10


def chain_time(fn, label):
    """fn(carry_scalar) -> scalar; chained N_ITERS times + host fetch."""
    c = fn(jnp.float32(0.0)) * 0  # warmup/compile, keep dtype
    _ = float(c)
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        c = fn(c)
    _ = float(c)
    dt = (time.perf_counter() - t0) / N_ITERS
    print(f"{label:42s} {dt*1e3:8.1f} ms")
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "default")
    jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))

    import dataclasses
    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array, weights_from_array,
                                      GT_KEYS)
    from mvsdf_tpu.rendering import render_forward
    from mvsdf_tpu.rendering.renderer import _frozen_trace
    from mvsdf_tpu.geometry.cameras import get_camera_params
    from mvsdf_tpu.supervision.losses import total_loss
    from tests.golden.scene_fixtures import make_scene

    cfg = MVSDFConfig(train=TrainConfig(batch_size=8, num_pixels=4096))
    # mirror bench.py defaults: capacity cascades + bf16 activation storage
    tr = dataclasses.replace(cfg.model.tracer,
                             sampler_capacity_frac=0.25,
                             fill_capacity_frac=0.5,
                             fallback_capacity_frac=(0.1875, 0.375),
                             march_compact_schedule=(
                                 (0, (0.375, 0.5)),
                                 (1, (0.1875, 0.25)),
                                 (5, (0.0625, 0.125, 0.25))))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, use_pallas_trace=True, tracer=tr,
        implicit=dataclasses.replace(cfg.model.implicit,
                                     bf16_activations=True)))

    scene = make_scene(n_images=8, n_pix=4096, feat_ch=32, img_hw=96,
                       depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    state = init_train_state(cfg, seed=0)
    gates = cfg.schedule.gates_for_phase(1)
    w = weights_to_array(cfg.schedule.weights(0.3))
    key = jax.random.PRNGKey(0)
    uv = batch["uv"]
    B, P, _ = uv.shape
    ray_dirs, cam_loc = get_camera_params(uv, batch["pose"],
                                          batch["intrinsics"])
    org = jnp.broadcast_to(cam_loc[:, None, :], (B, P, 3))
    om = jnp.ones((B, P), bool)
    ms = jax.random.uniform(key, (cfg.model.tracer.n_steps,))

    @jax.jit
    def trace_once(c):
        t = _frozen_trace(cfg.model, jax.lax.stop_gradient(state.params),
                          org, ray_dirs + c * 1e-12, om, True, ms)
        return jnp.mean(t.dists)

    @jax.jit
    def render_once(c):
        b = dict(batch)
        b["uv"] = batch["uv"] + c * 1e-12
        out = render_forward(cfg.model, state.params, b, training=True,
                             gates=gates, key=key)
        return jnp.mean(out.rgb_values)

    @jax.jit
    def fwd_once(c):
        b = dict(batch)
        b["uv"] = batch["uv"] + c * 1e-12
        out = render_forward(cfg.model, state.params, b, training=True,
                             gates=gates, key=key)
        gt = {k: b[k] for k in GT_KEYS}
        lt = total_loss(out, gt, gates, cfg.schedule, weights_from_array(w))
        return lt.loss

    @jax.jit
    def grad_once(c):
        def loss_fn(p):
            b = dict(batch)
            b["uv"] = batch["uv"] + c * 1e-12
            out = render_forward(cfg.model, p, b, training=True,
                                 gates=gates, key=key)
            gt = {k: b[k] for k in GT_KEYS}
            lt = total_loss(out, gt, gates, cfg.schedule,
                            weights_from_array(w))
            return lt.loss
        v, g = jax.value_and_grad(loss_fn)(state.params)
        # consume EVERY grad leaf (a single-leaf dependency would let XLA
        # DCE the rest of the backward); 1e-20 scale keeps v intact
        gsum = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
        return v + gsum * 1e-20

    t_trace = chain_time(trace_once, "no-grad trace")
    t_render = chain_time(render_once, "render_forward (trace+supervised)")
    t_fwd = chain_time(fwd_once, "forward + loss")
    t_grad = chain_time(grad_once, "value_and_grad")

    step = make_train_step(cfg, phase_idx=1, donate=False)
    s = state
    for _ in range(3):
        s, m = step(s, batch, w, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        s, m = step(s, batch, w, key)
    _ = float(m["loss"])
    t_step = (time.perf_counter() - t0) / N_ITERS
    print(f"{'full step (+clip+adam)':42s} {t_step*1e3:8.1f} ms")

    print()
    print(f"  supervised forward (render - trace): {(t_render-t_trace)*1e3:7.1f} ms")
    print(f"  loss terms (fwd - render):           {(t_fwd-t_render)*1e3:7.1f} ms")
    print(f"  backward (grad - fwd):               {(t_grad-t_fwd)*1e3:7.1f} ms")
    print(f"  clip+adam (step - grad):             {(t_step-t_grad)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()

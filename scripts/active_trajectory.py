"""Active-set trajectory on the bench fixture (ONE TPU process): per step,
the march-unfinished (sampler/fallback active) fraction, hit fraction, and
5-step-window step time — the data that sizes the capacity-cascade tiers
to what the bench protocol actually executes (steps 4-13 from init).
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from mvsdf_tpu.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_default_matmul_precision", "default")
    jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    float(jnp.ones(4).sum())

    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    from mvsdf_tpu.tracing.sphere_trace import TracerConfig, trace_rays
    from mvsdf_tpu.tracing.pallas import pack_sdf_weights, pallas_sdf_apply
    from mvsdf_tpu.geometry.cameras import get_camera_params
    from tests.golden.scene_fixtures import make_scene

    cfg = MVSDFConfig(train=TrainConfig(batch_size=8, num_pixels=4096))
    tr = dataclasses.replace(
        cfg.model.tracer, fill_misses=False,
        sampler_capacity_frac=0.25, fill_capacity_frac=0.5,
        fallback_capacity_frac=(0.0625, 0.1875, 0.375),
        march_compact_schedule=((0, (0.375, 0.5)), (1, (0.1875, 0.25)),
                                (5, (0.0625, 0.125, 0.25))))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, use_pallas_trace=True, tracer=tr,
        supervised_compact_frac=(0.25, 0.375),
        implicit=dataclasses.replace(cfg.model.implicit,
                                     bf16_activations=True)))

    scene = make_scene(n_images=8, n_pix=4096, feat_ch=32, img_hw=96,
                       depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    state = init_train_state(cfg, seed=0)
    step = make_train_step(cfg, phase_idx=1, donate=False)
    w = weights_to_array(cfg.schedule.weights(0.3))
    key = jax.random.PRNGKey(0)

    icfg = cfg.model.implicit
    ray_dirs, cam_loc = get_camera_params(batch["uv"], batch["pose"],
                                          batch["intrinsics"])
    org = jnp.broadcast_to(cam_loc[:, None, :], ray_dirs.shape)
    om = jnp.ones(ray_dirs.shape[:-1], bool)
    ms = jax.random.uniform(jax.random.PRNGKey(0), (100,))

    @jax.jit
    def counts(params):
        packed = pack_sdf_weights(icfg, params["implicit"])
        sdf_fn = lambda x: pallas_sdf_apply(icfg, packed, x)
        t = trace_rays(cfg.model.tracer, sdf_fn, org, ray_dirs, om,
                       training=True, minimal_steps=ms)
        # march state = sampler_mask; secant set = crossing hits among them
        R = om.size
        return (jnp.sum(t.sampler_mask) / R,
                jnp.sum(t.network_object_mask) / R)

    st = state
    c0 = counts(st.params)
    print(f"step  0: sampler_active={float(c0[0]):.4f} "
          f"hit={float(c0[1]):.4f}", flush=True)
    t_prev = time.perf_counter()
    for k in range(1, 41):
        st, m = step(st, batch, w, key)
        if k % 5 == 0:
            loss = float(np.asarray(m["loss"]))
            dt = (time.perf_counter() - t_prev) / 5
            c = counts(st.params)
            print(f"step {k:2d}: sampler_active={float(c[0]):.4f} "
                  f"hit={float(c[1]):.4f} loss={loss:.4f} "
                  f"window={dt*1e3:.1f} ms/step", flush=True)
            t_prev = time.perf_counter()


if __name__ == "__main__":
    main()

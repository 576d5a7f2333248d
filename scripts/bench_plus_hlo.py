"""bench.py equivalent + compiled-HLO broadcast attribution (ONE process).

Prints the bench JSON line, then the largest broadcast/copy ops in the
compiled step HLO with shapes and source ops, to attribute the ~10 ms/step
of broadcast traffic the op_profile showed.
"""
import dataclasses
import json
import os
import re
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
    from mvsdf_tpu.train.step import (make_step_body, make_train_step,
                                      init_train_state, weights_to_array)
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

    t0 = time.perf_counter()
    st = state
    for _ in range(3):
        st, metrics = step(st, batch, w, key)
    float(np.asarray(metrics["loss"]))
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s", flush=True)
    ITERS = 10
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st, metrics = step(st, batch, w, key)
    float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"metric": "train_rays_per_s_per_chip",
                      "value": round(8 * 4096 / dt, 1),
                      "step_ms": round(dt * 1e3, 2)}), flush=True)

    # --- compiled HLO: find the big broadcasts ----------------------------
    body = make_step_body(cfg, phase_idx=1)
    compiled = jax.jit(body).lower(state, batch, w, key).compile()
    txt = compiled.as_text()
    rows = []
    for m in re.finditer(
            r"(\S+) = (\S+) broadcast\(([^)]*)\)", txt):
        name, shape, operand = m.groups()
        nums = re.findall(r"(\d+(?:,\d+)*)\]", shape)
        rows.append((shape, name, operand[:60]))
    # rank by element count
    def elems(shape):
        m = re.search(r"\[([\d,]*)\]", shape)
        if not m or not m.group(1):
            return 1
        return int(np.prod([int(x) for x in m.group(1).split(",")]))
    rows.sort(key=lambda r: -elems(r[0]))
    print("\nlargest broadcasts in compiled HLO:")
    seen = set()
    shown = 0
    for shape, name, operand in rows:
        k = shape.split("{")[0]
        if k in seen:
            continue
        seen.add(k)
        print(f"  {shape:42s} {name[:40]} <- {operand}")
        shown += 1
        if shown >= 20:
            break
    # context lines for the top named broadcasts from the profile
    for tag in ("broadcast.2312", "broadcast.2239", "broadcast.2242",
                "pad.48"):
        for line in txt.splitlines():
            if tag + " " in line or tag + "." in line:
                print("CTX:", line.strip()[:220])
                break


if __name__ == "__main__":
    main()

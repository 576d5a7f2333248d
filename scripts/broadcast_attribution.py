"""Dump the ADOPTED round-5 step's optimized TPU HLO and attribute every
broadcast/copy instruction to its jax source line (HLO metadata op_name),
aggregated by site — the offline companion to the op-profile category
breakdown (PERF.md round 5: ~8 ms/step of ~0.1 ms broadcasts remained
after the sup-tier drop; this maps them to code).

Run solo (TPU, ~4 min):  timeout 1200 python scripts/broadcast_attribution.py
"""
import collections
import dataclasses
import os
import re
import sys

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
    print("backend up", flush=True)

    from mvsdf_tpu.config import MVSDFConfig, TrainConfig
    from mvsdf_tpu.train.step import (make_step_body, init_train_state,
                                      weights_to_array)
    from tests.golden.scene_fixtures import make_scene

    cfg = MVSDFConfig(train=TrainConfig(batch_size=8, num_pixels=4096))
    tr = dataclasses.replace(
        cfg.model.tracer, fill_misses=False,
        sampler_capacity_frac=0.25, fill_capacity_frac=0.5,
        fallback_capacity_frac=(0.0625, 0.09375, 0.375),
        march_compact_schedule=((0, (0.375, 0.5)), (1, (0.1875, 0.25)),
                                (5, (0.0625, 0.125, 0.25))))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, use_pallas_trace=True, tracer=tr,
        supervised_compact_frac=(0.375,),
        implicit=dataclasses.replace(cfg.model.implicit,
                                     bf16_activations=True)))

    scene = make_scene(n_images=8, n_pix=4096, feat_ch=32, img_hw=96,
                       depth_hw=48)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    state = init_train_state(cfg, seed=0)
    w = weights_to_array(cfg.schedule.weights(0.3))
    key = jax.random.PRNGKey(0)

    body = make_step_body(cfg, phase_idx=1)
    compiled = jax.jit(body).lower(state, batch, w, key).compile()
    txt = compiled.as_text()
    path = "/tmp/step_hlo_r5.txt"
    with open(path, "w") as f:
        f.write(txt)
    print(f"HLO dumped: {len(txt)} bytes -> {path}", flush=True)

    # attribute: find broadcast/copy instructions with shapes + metadata
    pat = re.compile(
        r"(\S+)\s*=\s*(\w+)\[([\d,]*)\][^\n]*?"
        r"(?:(broadcast|copy)\()[^\n]*?metadata=\{([^}]*)\}")
    by_site = collections.Counter()
    by_site_bytes = collections.Counter()
    n = 0
    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f16": 2, "s8": 1, "u8": 1}
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"\S+ = (\w+)\[([\d,]*)\]\S* (broadcast|copy)\(", ls)
        if not m:
            continue
        dtype, shape, kind = m.groups()
        dims = [int(x) for x in shape.split(",") if x] or [1]
        nbytes = int(np.prod(dims)) * dt_bytes.get(dtype, 4)
        if nbytes < 1 << 20:  # only materializations >= 1 MB matter
            continue
        mm = re.search(r'op_name="([^"]*)"', ls)
        src = re.search(r'source_file="([^"]*)".*source_line=(\d+)', ls)
        site = (mm.group(1)[:70] if mm else "?")
        if src:
            site += f"  [{os.path.basename(src.group(1))}:{src.group(2)}]"
        by_site[(kind, site)] += 1
        by_site_bytes[(kind, site)] += nbytes
        n += 1
    print(f"\n{n} large (>=1MB) broadcast/copy instructions, by site:")
    for (kind, site), cnt in by_site.most_common(25):
        mb = by_site_bytes[(kind, site)] / (1 << 20)
        print(f"  x{cnt:3d} {mb:8.1f} MB  {kind:9s} {site}")


if __name__ == "__main__":
    main()

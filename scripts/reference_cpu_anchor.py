"""Same-hardware anchor for the V100 throughput estimate (BASELINE.md).

The reference publishes no throughput numbers, so bench.py's vs_baseline
divides by a documented V100 *estimate* (~1e4 rays/s). This script anchors
that estimate with a measurement both frameworks can run here: one full-size
training step (batch 8 x 4096 rays, phase B, forward + 5-term loss +
backward + Adam) of the PyTorch reference (ref code/training/idr_train.py:
253-315) and of our JAX step, on the SAME CPU. The printed ratio is a
framework-to-framework comparison with zero hardware estimation in it; the
V100 scaling argument is then: reference-on-V100 ~ 30-80x reference-on-CPU
(typical for this MLP-dominated workload), which brackets the 1e4 rays/s
estimate used by bench.py.

Runs the reference via tests/golden/reference_harness.py (read-only import,
.cuda() patched out) — the same loader the golden parity tests use.

Usage: python scripts/reference_cpu_anchor.py [--n_pix 4096] [--iters 2]
Prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TP = 0.3  # phase B: all five losses active
FEAT = 32


def make_full_conf():
    from tests.golden.test_e2e_vs_reference import _Conf
    conf = _Conf()
    conf.d = dict(conf.d)
    conf.d["feature_vector_size"] = 256
    conf.d["implicit_network"] = dict(
        d_in=3, d_out=1, dims=[512] * 8, geometric_init=True, bias=0.6,
        skip_in=[4], weight_norm=True, multires=6)
    conf.d["rendering_network"] = dict(
        mode="idr", d_in=9, d_out=3, dims=[512] * 4, weight_norm=True,
        multires_view=4)
    return conf


def time_reference(scene, n_images, n_pix, iters):
    import torch
    from tests.golden.reference_harness import import_reference
    ref = import_reference()
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    model = ref["idr"].IDRNetwork(conf=make_full_conf())
    model.train()
    loss_mod = ref["loss"].IDRLoss()
    opt = torch.optim.Adam(model.parameters(), lr=2e-4 * n_images)

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in scene.items()}
    model_input = {k: t[k] for k in
                   ["uv", "intrinsics", "pose", "object_mask", "depths",
                    "depth_cams", "size", "center"]}
    gt = {k: t[k] for k in ["rgb", "depths", "depth_cams", "size", "center",
                            "feat", "feat_src", "cam", "src_cams"]}

    times = []
    for i in range(iters + 1):  # iteration 0 = warmup (allocator, autograd)
        t0 = time.perf_counter()
        out = model(model_input, TP)
        losses = loss_mod(out, gt, TP, n_images)
        opt.zero_grad()
        losses["loss"].backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 2.0)
        opt.step()
        times.append(time.perf_counter() - t0)
        print(f"  ref step {i}: {times[-1]:.1f}s", file=sys.stderr,
              flush=True)
    return float(np.mean(times[1:]))


def time_ours(scene, cfg, iters):
    import jax
    import jax.numpy as jnp
    from mvsdf_tpu.train.step import (make_train_step, init_train_state,
                                      weights_to_array)
    state = init_train_state(cfg, seed=0)
    step = make_train_step(cfg, phase_idx=1, donate=False)
    w = weights_to_array(cfg.schedule.weights(TP))
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()}
    key = jax.random.PRNGKey(0)
    state = state._replace(epoch=jnp.asarray(int(TP * cfg.train.nepochs),
                                             jnp.int32))
    # warmup/compile
    t0 = time.perf_counter()
    s1, m = step(state, batch, w, key)
    jax.block_until_ready(m["loss"])
    print(f"  ours compile+step0: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    times = []
    for i in range(iters):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        s1, m = step(s1, batch, w, k)
        jax.block_until_ready(m["loss"])
        times.append(time.perf_counter() - t0)
        print(f"  ours step {i}: {times[-1]:.1f}s", file=sys.stderr,
              flush=True)
    return float(np.mean(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=8)
    ap.add_argument("--n_pix", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from tests.golden.scene_fixtures import make_scene
    from mvsdf_tpu.config import MVSDFConfig, TrainConfig

    scene = make_scene(n_images=args.n_images, n_pix=args.n_pix,
                       feat_ch=FEAT, seed=3)

    cfg = MVSDFConfig(train=TrainConfig(batch_size=args.n_images,
                                        num_pixels=args.n_pix))

    print("timing reference (PyTorch, CPU)...", file=sys.stderr, flush=True)
    ref_s = time_reference(scene, args.n_images, args.n_pix, args.iters)
    print("timing ours (JAX, CPU)...", file=sys.stderr, flush=True)
    ours_s = time_ours(scene, cfg, args.iters)

    rays = args.n_images * args.n_pix
    out = {
        "shape": f"{args.n_images}x{args.n_pix}",
        "ref_step_s": round(ref_s, 2),
        "ours_step_s": round(ours_s, 2),
        "ref_rays_per_s_cpu": round(rays / ref_s, 1),
        "ours_rays_per_s_cpu": round(rays / ours_s, 1),
        "ours_over_ref_same_cpu": round(ref_s / ours_s, 2),
        "cpu_count": os.cpu_count(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

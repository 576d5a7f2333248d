"""Scaling-cost budget for the data-parallel multi-chip plan (SURVEY §5.8).

The training step is ray-parallel: the ray axis (B, P) is sharded over the
'data' mesh axis, parameters are replicated, and the ONLY cross-chip
traffic XLA inserts is (a) the gradient all-reduce (psum) and (b) scalar
metric reductions. This script measures the actual byte counts from the
real parameter tree and compares them against the measured step time and
published v5e ICI bandwidth to bound the scaling efficiency analytically —
the proxy for the >=85%-at-2-hosts north star that cannot be measured on
this single-chip environment (BASELINE.md).

Prints one JSON line. Pure CPU; runs anywhere.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from mvsdf_tpu.config import MVSDFConfig
    from mvsdf_tpu.train.step import init_train_state

    cfg = MVSDFConfig()
    state = init_train_state(cfg, seed=0)

    # bytes all-reduced per step = one f32 gradient per parameter
    grad_bytes = sum(np.prod(l.shape) * 4
                     for l in jax.tree_util.tree_leaves(state.params))
    # scalar metrics (loss terms, grad norm, hit frac): ~10 f32 psums
    metric_bytes = 10 * 4

    # v5e: 4 ICI links/chip at ~45 GB/s usable each direction (public spec:
    # 1600 Gbps aggregate). Ring all-reduce moves 2*(n-1)/n ~ 2x the payload
    # per chip; DCN (2-host) is the weak link at ~25 GB/s per host NIC.
    ici_gbs = 45.0
    dcn_gbs = 25.0
    step_s_measured = 0.0596  # round-5 steady-state window median, v5e
    # (59.6 ms/step at batch 8 x 4096 rays; PERF.md round 5 — the faster
    # the step, the harsher this worst-case no-overlap budget)

    t_allreduce_ici = 2 * grad_bytes / (ici_gbs * 1e9)
    t_allreduce_dcn = 2 * grad_bytes / (dcn_gbs * 1e9)

    # Per-chip step time is UNCHANGED under ray sharding (each chip traces
    # P/n rays of its own), so efficiency = t_step / (t_step + t_allreduce)
    # assuming zero overlap — the worst case; overlapping with the backward
    # recompute only improves it.
    eff_ici = step_s_measured / (step_s_measured + t_allreduce_ici)
    eff_dcn = step_s_measured / (step_s_measured + t_allreduce_dcn)

    out = {
        "grad_bytes_per_step": int(grad_bytes),
        "grad_mb": round(grad_bytes / 1e6, 2),
        "metric_bytes": metric_bytes,
        "step_s_single_chip": step_s_measured,
        "allreduce_s_ici": round(t_allreduce_ici, 6),
        "allreduce_s_dcn_2host": round(t_allreduce_dcn, 6),
        "scaling_eff_intra_slice": round(eff_ici, 4),
        "scaling_eff_2host_dcn": round(eff_dcn, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

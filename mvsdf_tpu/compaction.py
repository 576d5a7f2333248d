"""Mask-compacted computation with exact dense overflow.

The framework's central sparsity tool (no reference analog — the reference
uses data-dependent boolean indexing, ``code/model/ray_tracing.py:44-94``,
which XLA cannot compile to static shapes): run a per-row function only on
mask-selected rows gathered into a fixed-capacity block, scattering results
back into full-size arrays, falling back to the dense computation when more
rows are active than fit. Exact either way — callers rely on frozen lanes
being no-ops under their own masks.

Used by the trace fallback stages and mid-march segments
(``tracing/sphere_trace.py``) and by the supervised forward/shading
compaction (``rendering/renderer.py``).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def compact_call(fn, mask, capacity: Union[int, Sequence[int]],
                 per_ray_inputs, out_builders) -> Tuple:
    """Run ``fn`` (mapping per-row input arrays -> tuple of per-row outputs)
    only on mask-selected rows gathered into a fixed-capacity block,
    scattering results back into full-size arrays; falls back to the dense
    computation when more rows are active than fit. Exact either way.

    ``capacity`` may be a single int or an ascending tuple of ints — a
    CASCADE: at runtime the tightest tier that fits the active count runs
    (nested lax.cond; only one branch executes). The cascade adapts within
    a single compiled program as the active set shrinks over training
    (e.g. the trace fallback's miss set contracts as the surface forms).

    Layout note (measured, round 4): the nested-cond-with-per-tier-scatter
    form below BEATS both a single lax.switch whose tiers pad outputs to
    the top tier with one scatter outside (+3.6 ms/step device-busy) and a
    switch with per-tier scatters (+2.2 ms) on the full-size v5e train
    step — XLA schedules nested conds well, and the padded layouts pay
    more in builder gathers/concats than the cond-output copies they
    remove (scripts/compaction_ab.py, PERF.md round 4).

    per_ray_inputs: flat (R, ...) arrays; out_builders: zero arrays defining
    output shapes/dtypes ((R, ...) each).

    Equivalent to ``compact_call_into`` with the builders as targets and no
    out_masks (every block row written; builders define the non-block
    rows' values).
    """
    return compact_call_into(fn, mask, capacity, per_ray_inputs,
                             out_builders)


def _normalize_caps(capacity, R):
    caps = tuple(capacity) if isinstance(capacity, (tuple, list)) \
        else (capacity,)
    return tuple(sorted(c for c in caps if c < R))


def _where_rows(m, o, t):
    """Row-masked merge broadcasting m (R,) over o/t (R, ...)."""
    return jnp.where(m.reshape(m.shape + (1,) * (o.ndim - m.ndim)), o, t)


def compact_call_into(fn, mask, capacity: Union[int, Sequence[int]],
                      per_ray_inputs, targets,
                      out_masks=None, remat: bool = False) -> Tuple:
    """``compact_call`` that scatters each output DIRECTLY into a caller-
    provided full-size merge target instead of a fresh ``jnp.zeros``
    builder, fusing the call-site ``jnp.where(merge_mask, out, prior)``
    into the scatter. Profiling round 4's full-size v5e step showed ~16 ms
    (27.7%) of device-busy in broadcasts — the per-tier zero
    materializations plus the zero cotangent bases of the where-merges
    this layout deletes (PERF.md round 5).

    targets: full-size (R, ...) arrays holding the value every non-merged
    row keeps. Two write modes:

    - ``out_masks=None``: every gathered block row is written back
      (single unpredicated scatter — the cheapest form). Requires that
      ``fn``'s output on a non-``mask`` row equals that row's target value
      (frozen-lane no-op, e.g. the mid-march segments) or that callers
      never consume non-``mask`` lanes (e.g. zeros targets whose dead
      lanes are masked by every consumer).
    - ``out_masks=(m0, m1, ...)``: per-output (R,) bool merge masks, each
      a subset of ``mask``; rows outside an output's merge mask keep the
      target value exactly — their scatter index is the out-of-bounds
      sentinel R and ``mode='drop'`` discards them.

    The dense overflow branch computes ``fn`` on all rows and where-merges
    by out_masks (or returns the outputs unmerged when ``out_masks`` is
    None, matching the unpredicated contract). Exact in every branch.

    ``remat=True`` wraps ``fn`` in ``jax.checkpoint`` — REQUIRED for good
    performance when ``fn`` is differentiated: ``lax.cond`` linearization
    unions the residuals of every branch into one output tuple and
    ZERO-FILLS the untaken branches' slots, so a differentiated cascade
    materializes the dense branch's full-width activation stack as zero
    splats on every step the compact tier is taken (measured 5-8 ms/step
    of pure broadcast writes on the full-size v5e step — the round-5 HLO
    shows ~50 x f32/bf16/pred[32768,512] zero broadcasts feeding the cond
    root tuple; PERF.md round 5). With checkpoint the residual set shrinks
    to ``fn``'s inputs (block-sized), and the backward recomputes the
    tier-sized forward instead — bit-identical gradients (deterministic
    recompute of the same ops on the same values).
    """
    if remat:
        fn = jax.checkpoint(fn)
    R = mask.shape[0]
    caps = _normalize_caps(capacity, R)
    n_out = len(targets)
    if out_masks is not None and len(out_masks) != n_out:
        raise ValueError("out_masks must match targets 1:1")

    def dense_outs():
        outs = tuple(fn(*per_ray_inputs))
        if out_masks is None:
            return outs
        return tuple(_where_rows(m, o, t)
                     for m, o, t in zip(out_masks, outs, targets))

    if not caps:
        return dense_outs()
    count = jnp.sum(mask)
    order = jnp.argsort(~mask, stable=True)

    def dense(_tgts):
        return dense_outs()

    def compact_at(cap):
        def compact(tgts):
            idx = order[:cap]
            sub = [a[idx] for a in per_ray_inputs]
            outs = fn(*sub)
            if out_masks is None:
                return tuple(t.at[idx].set(o) for t, o in zip(tgts, outs))
            merged = []
            for m, t, o in zip(out_masks, tgts, outs):
                safe_idx = jnp.where(m[idx], idx, R)  # OOB -> dropped
                merged.append(t.at[safe_idx].set(o, mode="drop"))
            return tuple(merged)
        return compact

    branch = dense
    for cap in reversed(caps):
        branch = functools.partial(
            lambda cap, nxt, tgts: jax.lax.cond(
                count <= cap, compact_at(cap), nxt, tgts),
            cap, branch)
    return branch(tuple(targets))


def legacy_compact_call_into(fn, mask, capacity, per_ray_inputs, targets,
                             out_masks=None) -> Tuple:
    """The round-4 layout behind the ``compact_call_into`` contract, kept
    for the measured A/B (scripts/scatter_into_ab.py) and as a reference
    implementation: zeros out_builders + call-site where-merge when
    ``out_masks`` is given, targets-as-builders when not (the old
    mid-march form). Bit-identical results to ``compact_call_into``."""
    if out_masks is None:
        return compact_call(fn, mask, capacity, per_ray_inputs, targets)
    outs = compact_call(fn, mask, capacity, per_ray_inputs,
                        [jnp.zeros_like(t) for t in targets])
    return tuple(_where_rows(m, o, t)
                 for m, o, t in zip(out_masks, outs, targets))

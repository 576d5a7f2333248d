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
    """
    R = mask.shape[0]
    caps = tuple(capacity) if isinstance(capacity, (tuple, list)) \
        else (capacity,)
    caps = tuple(sorted(c for c in caps if c < R))
    if not caps:
        # capacity covers every row: run dense directly, no gather/scatter
        # or cond (scenes whose mask stats make compaction pointless —
        # see tracing.sphere_trace.auto_fallback_capacity)
        return tuple(fn(*per_ray_inputs))
    count = jnp.sum(mask)
    order = jnp.argsort(~mask, stable=True)

    def dense(_):
        return tuple(fn(*per_ray_inputs))

    def compact_at(cap):
        def compact(_):
            idx = order[:cap]
            sub = [a[idx] for a in per_ray_inputs]
            outs = fn(*sub)
            return tuple(base.at[idx].set(o)
                         for base, o in zip(out_builders, outs))
        return compact

    branch = dense
    for cap in reversed(caps):
        branch = functools.partial(
            lambda cap, nxt, _: jax.lax.cond(count <= cap, compact_at(cap),
                                             nxt, 0),
            cap, branch)
    return branch(0)

"""Differentiable-surface ray tracing: bidirectional sphere tracing with a
uniform-sampling + secant fallback, as fixed-shape masked computation.

Behavioral parity target: reference ``code/model/ray_tracing.py`` (RayTracing).
The reference mutates boolean-indexed subsets ("unfinished" rays) with
data-dependent shapes and Python early-exits; here every ray keeps a lane and
converged lanes are frozen by masks, with a ``lax.while_loop`` providing the
early-exit *in time* (trip count) without dynamic shapes — the XLA-native
formulation. All SDF MLP evaluations are dense batched matmuls feeding the
MXU.

Shape-polymorphic: rays carry any leading shape L (typically (B, P) with the
per-image ray axis P sharded across the device mesh); every operation is
either elementwise over L or a reduction over the trailing sample axis, so
data-parallel sharding propagates with zero resharding. The dense sampler's
(L, n_steps) SDF evaluation is chunked along the *sample* axis (a replicated
axis) via ``lax.map`` to bound peak HBM without disturbing ray sharding.

Stages (ref line numbers):
  1. ray/bounding-sphere intersection            (rend_util.py:141-162)
  2. bidirectional sphere tracing + line search  (ray_tracing.py:101-196)
  3. uniform interval sampler, first-sign-crossing via the sign*arange
     argmin trick                                (ray_tracing.py:198-258)
  4. bracketed secant refinement, fixed steps    (ray_tracing.py:260-278)
  5. training-mode miss filling: origin projection for non-intersecting
     rays, min-SDF point along the ray otherwise (ray_tracing.py:73-94,
                                                  280-308)
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..compaction import compact_call, compact_call_into


@dataclasses.dataclass(frozen=True)
class TracerConfig:
    object_bounding_sphere: float = 1.0
    sdf_threshold: float = 5.0e-5
    line_search_step: float = 0.5
    line_step_iters: int = 3
    sphere_tracing_iters: int = 10
    n_steps: int = 100
    n_secant_steps: int = 8
    dist_clip: float = 0.5  # 0.05 in high-quality render mode (ref :127-131)
    sample_chunk: int = 20  # sample-axis slices evaluated per lax.map step
    # Fallback-stage compaction: the uniform sampler / min-SDF filler only
    # process this fraction of rays (gathered by mask) when the active count
    # fits; otherwise a dense branch runs (exact in both cases). 1.0 = always
    # dense (the reference-parity default). Single-chip optimization: the
    # gather crosses shard boundaries, so leave at 1.0 on multi-chip meshes
    # (or run the trace under shard_map, where compaction is per-device).
    # Tuples build capacity cascades (see fallback_capacity_frac).
    sampler_capacity_frac: Union[float, Tuple[float, ...]] = 1.0
    fill_capacity_frac: Union[float, Tuple[float, ...]] = 1.0
    # Unified fallback (training only): the sampler rays (march unfinished)
    # and the min-SDF fill rays (misses) are DISJOINT, so one compacted
    # n_steps-sample evaluation serves both — per-ray step patterns select
    # uniform-linspace (sampler) vs random-stratified (fill) rows. Replaces
    # the two separate stages when > 0; exact either way. A tuple of
    # fractions builds a capacity CASCADE (the tightest tier that fits the
    # runtime active count runs) — the active set shrinks as the surface
    # forms, and the cascade follows it within one compiled program.
    fallback_capacity_frac: Union[float, Tuple[float, ...]] = 0.0
    # Mid-march compaction: ((start_iter, capacity_frac), ...) splits the
    # bidirectional march into segments; from ``start_iter`` on, only up to
    # capacity_frac * R rays (those still marching in either direction) are
    # evaluated, gathered into a fixed block (dense branch on overflow —
    # exact either way; converged lanes are frozen by masks and never move,
    # so excluding them changes nothing). Iterations before the first
    # start_iter run dense. () = always dense (reference-parity default).
    # capacity_frac may be a TUPLE of fractions — a capacity cascade per
    # segment (see fallback_capacity_frac); an overflow of the tight tier
    # then costs one tier up instead of a full-R dense segment (profiling
    # showed borderline early-training counts flipping segments dense for
    # ~16 ms/step). Measured on the bench fixture only 33% of rays
    # intersect the bounding sphere and 14% are still marching after one
    # iteration — the march is FLOP-bound, so this is a near-proportional
    # saving (PERF.md).
    march_compact_schedule: Tuple[Tuple[int, Any], ...] = ()
    # Training-mode miss filling (ref ray_tracing.py:86-94, 280-308). The
    # fill's outputs — points/dists of non-hit rays — are provably DEAD in
    # the reference's training step: loss.py consumes no row of 'points' /
    # 'sdf_output' at non-hit rays (every term multiplies those lanes by an
    # exactly-zero mask; see losses.py), and the plot path runs eval-mode
    # forwards where the fill never executes (idr_train.py:200-233 +
    # ray_tracing.py:68-71). False skips the fill's n_steps-sample SDF
    # evaluation: losses and gradients are BIT-IDENTICAL (tested in
    # tests/unit/test_fill_skip.py), only the unconsumed miss-lane
    # points/dists change. On masked scenes the fill covers most rays
    # (0.62 of all rays on the round-2 capstone scene vs 0.21 for the
    # sampler), so this is the dominant trace saving there. True keeps
    # the reference-parity fill for golden tests and plot-path probing.
    fill_misses: bool = True


class TraceResult(NamedTuple):
    points: jnp.ndarray          # (L..., 3) surface / fallback points
    network_object_mask: jnp.ndarray  # (L...) bool: ray hit the SDF surface
    dists: jnp.ndarray           # (L...) distance along ray
    sampler_mask: jnp.ndarray    # (L...) bool: handled by fallback sampler
    mask_intersect: jnp.ndarray  # (L...) bool: ray intersects bounding sphere


def _eval_samples(cfg: TracerConfig, sdf_fn, pts):
    """SDF at pts (L..., S, 3) -> (L..., S), chunked along the sample axis S
    (ref chunks flat points at 100k: ray_tracing.py:217). The sample axis is
    replicated, so chunking never reshards the ray axis."""
    S = pts.shape[-2]
    cs = cfg.sample_chunk
    if cs <= 0 or S <= cs or S % cs != 0:
        return sdf_fn(pts)
    moved = jnp.moveaxis(pts, -2, 0)                 # (S, L..., 3)
    chunks = moved.reshape((S // cs, cs) + moved.shape[1:])
    out = jax.lax.map(sdf_fn, chunks)                # (S//cs, cs, L...)
    return jnp.moveaxis(out.reshape((S,) + out.shape[2:]), 0, -1)


def _take(a, idx):
    """a (L..., S[, 3]), idx (L...) -> (L...[, 3]) via take_along_axis."""
    if a.ndim == idx.ndim + 2:  # trailing vector dim
        return jnp.take_along_axis(
            a, idx[..., None, None], axis=-2).squeeze(-2)
    return jnp.take_along_axis(a, idx[..., None], axis=-1).squeeze(-1)


def _mask_update(unfin2, next2, thr):
    """Reference loop-top bookkeeping (ray_tracing.py:140-151)."""
    curr2 = jnp.where(unfin2, next2, 0.0)
    curr2 = jnp.where(curr2 <= thr, 0.0, curr2)
    return unfin2 & (curr2 > thr), curr2


def _march_iters(cfg: TracerConfig, sdf_fn, org, dirs, unfin2, t2, next2,
                 i0: int, i1: int, init: bool):
    """Bidirectional march iterations [i0, i1) on flat (N,)-ray state.

    org, dirs: (N, 3); unfin2, t2, next2: (2, N) — start/end march states
    stacked on axis 0 so every SDF evaluation (the expensive part) is one
    doubled-batch call: half the kernel launches, twice the matmul rows.
    ``init`` additionally computes the pre-loop SDF evaluation at the
    seeded t values (ref ray_tracing.py:134-138). Converged/inactive lanes
    are frozen by masks: their t never moves and their next value is
    masked to 0, so running extra lanes (or extra trips) is a no-op.
    """
    thr = cfg.sdf_threshold
    clip = cfg.dist_clip
    org2 = jnp.stack([org, org])          # (2, N, 3)
    dirs2 = jnp.stack([dirs, dirs])
    sign2 = jnp.asarray([[1.0], [-1.0]])  # (2, 1)

    def eval_masked(t2, m2):
        p = org2 + t2[..., None] * dirs2
        v = jnp.clip(sdf_fn(p), -clip, clip)
        return jnp.where(m2, v, 0.0)

    if init:
        next2 = eval_masked(t2, unfin2)

    def line_search(t2, curr2, next2):
        """Back-stepping line search halving the overshoot (ref :173-191);
        the start march steps t down, the end march steps t up."""
        def cond(state):
            j, _, not_proj, _ = state
            return (j < cfg.line_step_iters) & jnp.any(not_proj)

        def body(state):
            j, t2, not_proj, next2 = state
            step = ((1 - cfg.line_search_step) / (2.0 ** j)) * curr2
            t2 = jnp.where(not_proj, t2 - sign2 * step, t2)
            p = org2 + t2[..., None] * dirs2
            v = jnp.clip(sdf_fn(p), -clip, clip)
            next2 = jnp.where(not_proj, v, next2)
            return j + 1, t2, next2 < 0, next2

        not_proj = next2 < 0
        _, t2, _, next2 = jax.lax.while_loop(
            cond, body, (0, t2, not_proj, next2))
        return t2, next2

    def cond(state):
        i, unfin2, *_ = state
        return (i < i1) & jnp.any(unfin2)

    def body(state):
        i, unfin2, t2, next2 = state
        unfin2, curr2 = _mask_update(unfin2, next2, thr)
        # March (no-op on lanes that just converged: curr == 0 there, and
        # evals/line-search are masked to their frozen values).
        t2 = t2 + sign2 * curr2
        next2 = eval_masked(t2, unfin2)
        t2, next2 = line_search(t2, curr2, next2)
        ok = t2[0] < t2[1]
        return i + 1, unfin2 & ok[None], t2, next2

    _, unfin2, t2, next2 = jax.lax.while_loop(
        cond, body, (i0, unfin2, t2, next2))
    return unfin2, t2, next2


def _sphere_trace(cfg: TracerConfig, sdf_fn, org, dirs, mask_intersect,
                  t_near, t_far):
    """Bidirectional sphere tracing (ref ray_tracing.py:101-196), optionally
    with mid-march compaction (cfg.march_compact_schedule): the iteration
    range is split into segments and later segments gather only the rays
    still marching into a fixed-capacity block (_compact_call; dense branch
    on overflow). Exact: frozen lanes never change state, every active ray
    is inside the gathered set, and the lane-wise update rule is identical,
    so segment boundaries and compaction are unobservable in the result.

    org, dirs: (L..., 3); mask_intersect, t_near, t_far: (L...).
    Returns (unfinished_start, t_start, t_end).
    """
    lead = mask_intersect.shape
    R = int(np.prod(lead)) if lead else 1
    orgf = org.reshape(R, 3)
    dirsf = dirs.reshape(R, 3)
    mi = mask_intersect.reshape(R)

    unfin2 = jnp.stack([mi, mi])                      # (2, R)
    t2 = jnp.where(unfin2,
                   jnp.stack([t_near.reshape(R), t_far.reshape(R)]), 0.0)
    next2 = jnp.zeros_like(t2)  # set by the first segment's init eval

    iters = cfg.sphere_tracing_iters
    sched = [(s, f) for s, f in cfg.march_compact_schedule if s < iters]
    segments = []                                     # (i0, i1, frac|None)
    if not sched:
        segments.append((0, iters, None))
    else:
        starts = [s for s, _ in sched]
        if starts != sorted(starts) or len(set(starts)) != len(starts):
            raise ValueError(
                f"march_compact_schedule starts must be strictly "
                f"increasing: {cfg.march_compact_schedule}")
        if starts[0] > 0:
            segments.append((0, starts[0], None))
        for k, (s, f) in enumerate(sched):
            e = sched[k + 1][0] if k + 1 < len(sched) else iters
            segments.append((s, e, f))

    for i0, i1, frac in segments:
        init = i0 == 0
        fracs = tuple(frac) if isinstance(frac, (tuple, list)) else \
            (frac,) if frac is not None else ()
        caps = tuple(max(128, int(R * f)) for f in fracs if int(R * f) < R)
        if not caps:
            unfin2, t2, next2 = _march_iters(
                cfg, sdf_fn, orgf, dirsf, unfin2, t2, next2, i0, i1, init)
            continue
        cap = caps
        active = mi if init else (unfin2[0] | unfin2[1])

        def seg_fn(o, d, u, tt, nx, i0=i0, i1=i1, init=init):
            u2, t2c, n2c = _march_iters(cfg, sdf_fn, o, d, u.T, tt.T, nx.T,
                                        i0, i1, init)
            return u2.T, t2c.T, n2c.T

        # Unpredicated direct scatter into the march state (out_masks=None):
        # frozen lanes' seg_fn outputs equal their inputs bit-exactly, so
        # writing every block row back is a no-op on them.
        u_o, t_o, n_o = _compact_call_into(
            seg_fn, active, cap,
            [orgf, dirsf, unfin2.T, t2.T, next2.T],
            [unfin2.T, t2.T, next2.T])
        unfin2, t2, next2 = u_o.T, t_o.T, n_o.T

    # Final bookkeeping-only pass (the reference breaks *after* the mask
    # update at iters == sphere_tracing_iters; ray_tracing.py:153-155).
    unfin2, _ = _mask_update(unfin2, next2, cfg.sdf_threshold)
    return (unfin2[0].reshape(lead), t2[0].reshape(lead),
            t2[1].reshape(lead))


def _ray_sampler(cfg: TracerConfig, sdf_fn, org, dirs, object_mask,
                 t_min, t_max, training: bool, secant_fn=None):
    """Uniform interval sampling + secant (ref ray_tracing.py:198-278),
    dense over all rays; callers merge via sampler_mask.

    Returns (points (L..., 3), net_surface (L...), dists (L...))."""
    S = cfg.n_steps
    steps = jnp.linspace(0.0, 1.0, S)
    shp = (1,) * t_min.ndim + (S,)
    ts = t_min[..., None] + steps.reshape(shp) * (t_max - t_min)[..., None]
    pts = org[..., None, :] + ts[..., None] * dirs[..., None, :]
    sdf_val = _eval_samples(cfg, sdf_fn, pts)        # (L..., S)
    return _sampler_logic(cfg, sdf_fn, org, dirs, object_mask, ts, pts,
                          sdf_val, training, secant_fn=secant_fn)


def _sampler_logic(cfg: TracerConfig, sdf_fn, org, dirs, object_mask, ts,
                   pts, sdf_val, training: bool, secant_fn=None):
    """Sampler post-processing on precomputed samples: first sign crossing,
    min-SDF fallback, secant (ref ray_tracing.py:221-256)."""
    S = cfg.n_steps
    shp = (1,) * (ts.ndim - 1) + (S,)
    # First sign transition: argmin of sign(sdf) * [S..1] returns the first
    # negative sample (ref :221-222).
    weight = jnp.arange(S, 0, -1, dtype=sdf_val.dtype).reshape(shp)
    ind = jnp.argmin(jnp.sign(sdf_val) * weight, axis=-1)
    net_surface = _take(sdf_val, ind) < 0

    # Rays without a usable crossing take the min-SDF sample (ref :229-235).
    p_out = ~(object_mask & net_surface)
    out_ind = jnp.argmin(sdf_val, axis=-1)
    pick = jnp.where(p_out, out_ind, ind)
    d = _take(ts, pick)
    p = _take(pts, pick)

    # Secant refinement on sign-crossing rays (ref :242-256; eval mode uses
    # net_surface alone).
    secant_sel = (net_surface & object_mask) if training else net_surface
    z_high = _take(ts, ind)
    sdf_high = _take(sdf_val, ind)
    ind_lo = (ind - 1) % S  # torch negative indexing wraps (ref :248)
    z_low = _take(ts, ind_lo)
    sdf_low = _take(sdf_val, ind_lo)
    if secant_fn is None:
        z_pred = _secant(cfg, sdf_fn, org, dirs, z_low, z_high, sdf_low,
                         sdf_high)
    else:
        z_pred = secant_fn(org, dirs, z_low, z_high, sdf_low, sdf_high)
    d = jnp.where(secant_sel, z_pred, d)
    p = jnp.where(secant_sel[..., None], org + z_pred[..., None] * dirs, p)
    return p, net_surface, d


def _secant(cfg: TracerConfig, sdf_fn, org, dirs, z_low, z_high, sdf_low,
            sdf_high):
    """Fixed-iteration bracketed secant root find (ref ray_tracing.py:260-278).
    All (L...) arrays; division guarded for frozen/degenerate lanes."""
    def z_of(sl, sh, zl, zh):
        denom = sh - sl
        denom = jnp.where(jnp.abs(denom) < 1e-12,
                          jnp.where(denom < 0, -1e-12, 1e-12), denom)
        return -sl * (zh - zl) / denom + zl

    def body(_, state):
        z_low, z_high, sdf_low, sdf_high, z_pred = state
        p_mid = org + z_pred[..., None] * dirs
        sdf_mid = sdf_fn(p_mid)
        pos = sdf_mid > 0
        neg = sdf_mid < 0
        z_low = jnp.where(pos, z_pred, z_low)
        sdf_low = jnp.where(pos, sdf_mid, sdf_low)
        z_high = jnp.where(neg, z_pred, z_high)
        sdf_high = jnp.where(neg, sdf_mid, sdf_high)
        z_pred = z_of(sdf_low, sdf_high, z_low, z_high)
        return z_low, z_high, sdf_low, sdf_high, z_pred

    z_pred = z_of(sdf_low, sdf_high, z_low, z_high)
    state = (z_low, z_high, sdf_low, sdf_high, z_pred)
    state = jax.lax.fori_loop(0, cfg.n_secant_steps, body, state)
    return state[-1]


def _minimal_sdf_points(cfg: TracerConfig, sdf_fn, org, dirs, t_min, t_max,
                        steps01):
    """Min-SDF point along each ray over random stratified samples
    (ref ray_tracing.py:280-308). steps01: (n_steps,) uniforms in [0, 1)."""
    S = cfg.n_steps
    shp = (1,) * t_min.ndim + (S,)
    ts = steps01.reshape(shp) * (t_max - t_min)[..., None] + t_min[..., None]
    pts = org[..., None, :] + ts[..., None] * dirs[..., None, :]
    sdf_val = _eval_samples(cfg, sdf_fn, pts)
    idx = jnp.argmin(sdf_val, axis=-1)
    return _take(pts, idx), _take(ts, idx)


def _unified_fallback(cfg: TracerConfig, sdf_fn, org, dirs, object_mask,
                      is_smp, t_lo, t_hi, steps01, training: bool,
                      secant_fn=None):
    """One n_steps-sample evaluation serving BOTH fallback stages: sampler
    rows (is_smp) use the uniform linspace steps (ref ray_tracing.py:213),
    fill rows the shared random stratified steps (ref :287). Per-row results
    are identical to the separate stages — the only difference is that the
    SDF MLP runs once over the union instead of once per stage.

    Returns (points (R, 3), net_surface (R,), dists (R,))."""
    S = cfg.n_steps
    lin = jnp.linspace(0.0, 1.0, S)
    steps = jnp.where(is_smp[..., None], lin[None, :], steps01[None, :])
    ts = t_lo[..., None] + steps * (t_hi - t_lo)[..., None]
    pts = org[..., None, :] + ts[..., None] * dirs[..., None, :]
    sdf_val = _eval_samples(cfg, sdf_fn, pts)

    smp_p, smp_net, smp_d = _sampler_logic(
        cfg, sdf_fn, org, dirs, object_mask, ts, pts, sdf_val, training,
        secant_fn=secant_fn)
    idx = jnp.argmin(sdf_val, axis=-1)
    mn_p, mn_d = _take(pts, idx), _take(ts, idx)

    p = jnp.where(is_smp[..., None], smp_p, mn_p)
    d = jnp.where(is_smp, smp_d, mn_d)
    return p, smp_net, d


def auto_fallback_capacity(object_frac: float, sampler_margin: float = 0.30,
                           granularity: float = 1 / 16,
                           intersect_frac: Optional[float] = None,
                           fill_misses: bool = True) -> float:
    """Scene-aware capacity for the unified fallback stage.

    The fallback's active set is (march-unfinished rays) ∪ (every
    out-of-object-mask ray that intersects the bounding sphere) — the
    reference evaluates exactly this set by boolean indexing
    (ref ray_tracing.py:44-94). The out-of-mask part is STATIC per scene
    (1 - object_frac of rays, nearly all of which hit the bounding
    sphere), so a fixed capacity below it guarantees the dense overflow
    branch every step: the round-2 capstone scene (object_frac 0.38) ran
    active=0.84 against capacity 0.5 and paid dense 100-sample evals on
    all rays. Size the capacity as out-of-mask + a march-unfinished
    margin, rounded up for shape stability; >= 0.9 collapses to 1.0
    (pure dense, no gather — a near-full gather costs more than it saves).

    EVERY fallback ray additionally intersects the bounding sphere
    (both the sampler and fill sets require mask_intersect; left_out rays
    take the origin-projection branch instead, ref :79-84), so the
    scene's sphere-intersect fraction — pure camera geometry, no SDF —
    is a hard upper bound on the active set. Pass ``intersect_frac``
    (mean over sampled pixels of ray/bounding-sphere intersection) to
    apply it: on wide-FoV scenes where much of the frame misses the
    sphere it is far tighter than the mask bound (bench fixture: 0.33
    intersect vs all-ones masks).

    object_frac: mean of the scene's object masks over all images/pixels.
    fill_misses: False = the trace skips the min-SDF fill (see
    TracerConfig.fill_misses), so the active set is ONLY the
    march-unfinished sampler rays — the static out-of-mask term vanishes
    and the capacity is the sampler margin under the intersect bound.
    """
    if not fill_misses:
        frac = sampler_margin
        if intersect_frac is not None:
            frac = min(frac, intersect_frac + granularity)
    elif intersect_frac is not None:
        # the hard bound: active ⊆ intersecting rays, +granularity slack
        frac = intersect_frac + granularity
    else:
        frac = (1.0 - object_frac) + sampler_margin
    frac = np.ceil(frac / granularity) * granularity
    if frac >= 0.9:
        return 1.0
    return float(max(frac, granularity))


def auto_fallback_cascade(object_frac: float, sampler_margin: float = 0.30,
                          granularity: float = 1 / 16,
                          intersect_frac: Optional[float] = None,
                          fill_misses: bool = True):
    """Capacity cascade for the unified fallback.

    Top tier: the guaranteed static bound (sphere-intersect fraction when
    known, else the mask heuristic). Lower tiers (the mask heuristic, or
    half the top) engage automatically once training shrinks the miss set
    (the surface forms, fill rays become hits). Exact at every tier —
    overflow falls through to the next tier / dense.

    fill_misses=False (the fill-skipping trace, TracerConfig.fill_misses):
    the active set is only the march-unfinished rays — tiers are fractions
    of the sampler margin under the intersect bound, plus the intersect
    bound itself as the overflow tier (dense beyond it is impossible in
    exact arithmetic but kept as the cascade's safety property).
    """
    top = auto_fallback_capacity(object_frac, sampler_margin, granularity,
                                 intersect_frac, fill_misses=fill_misses)
    if top >= 1.0:
        return (1.0,)
    tiers = {top}
    if not fill_misses:
        half = float(max(np.ceil(top / 2 / granularity) * granularity,
                         2 * granularity))
        if half < top:
            tiers.add(half)
        if intersect_frac is not None:
            over = auto_fallback_capacity(object_frac, sampler_margin,
                                          granularity, intersect_frac)
            if 1.0 > over > top:
                tiers.add(over)
        return tuple(sorted(tiers))
    if intersect_frac is not None:
        mask_tier = auto_fallback_capacity(object_frac, sampler_margin,
                                           granularity)
        if mask_tier < top:
            tiers.add(mask_tier)
    if len(tiers) == 1:
        half = float(max(np.ceil(top / 2 / granularity) * granularity,
                         2 * granularity))
        if half < top:
            tiers.add(half)
    return tuple(sorted(tiers))


def auto_supervised_cascade(intersect_frac: Optional[float] = None,
                            granularity: float = 1 / 16):
    """Capacity ladder for the supervised-path compaction
    (ModelConfig.supervised_compact_frac). The compacted set is the
    surface-hit lanes, which is bounded above by the sphere-intersect
    fraction (a non-intersecting ray can never be a hit) but otherwise
    scene- and training-state-dependent (early training: nearly every
    intersecting ray hits the init sphere; converged: the object mask
    plus whatever real background geometry exists — measured hit 0.6 on
    the capstone scene whose MASK is 0.232, because the ground plane is
    genuine geometry). The intersect fraction is a HARD bound (a hit
    requires a sphere crossing), so a bound tier can never overflow.

    Compaction only engages when that guaranteed bound is < 0.5:
    measured on v5e, a capstone whose hit fraction sat at ~0.6 ran 9%
    SLOWER with a (0.25, 0.5, 0.75) cascade (median 165.1k vs 180.6k
    rays/s dense) — gathering 75% of rows costs more than the 25% row
    saving — while the wide-FoV bench fixture (bound 0.375) gains 6%
    (PERF.md round 3). Returns () when the bound cannot guarantee the
    win.

    SINGLE tier (round 5): the bound tier alone beats a (0.25, bound)
    cascade wherever measured — bench fixture (steady hit 0.30-0.32
    never fits a 0.25 tier; dropping it = -2.3 ms/step device) AND the
    mask-tight win-regime scene (358.5k vs 346.7k median rays/s, quality
    identical; scripts/full_training_validation.py --supervised_compact
    top vs auto, PERF.md round 5). A sub-bound tier only pays when the
    hit fraction sits under it, which no measured scene's steady state
    does; overflow safety is moot since the bound tier cannot overflow."""
    if intersect_frac is None:
        return ()
    bound = float(np.ceil(intersect_frac / granularity) * granularity)
    if bound >= 0.5:
        return ()
    return (max(bound, 2 * granularity),)


def ray_intersect_fraction(uv, intrinsics, pose, radius: float = 1.0,
                           max_rays: int = 200_000) -> float:
    """Fraction of pixel rays that intersect the bounding sphere — the
    hard geometric bound on the fallback active set. Host-side numpy over
    a pixel subsample; cheap enough to run once at trainer setup.

    uv (B, P, 2) pixel coords, intrinsics (B, 4, 4), pose (B, 4, 4).
    """
    from ..geometry.cameras import get_camera_params
    uv = np.asarray(uv)
    B, P, _ = uv.shape
    stride = max(1, (B * P) // max_rays)
    uv = uv[:, ::stride]
    dirs, org = jax.tree_util.tree_map(
        np.asarray, get_camera_params(jnp.asarray(uv),
                                      jnp.asarray(np.asarray(pose)),
                                      jnp.asarray(np.asarray(intrinsics))))
    org = np.broadcast_to(org[:, None, :], dirs.shape)
    d_dot_o = np.sum(dirs * org, -1)
    under = d_dot_o ** 2 - (np.sum(org ** 2, -1) - radius ** 2)
    return float(np.mean(under > 0))


def auto_march_schedule(object_frac: float, granularity: float = 1 / 16,
                        intersect_frac: Optional[float] = None):
    """Scene-aware mid-march compaction schedule.

    Measured decay profiles (scripts/march_decay.py): object rays converge
    within ~2 iterations; background (out-of-mask) rays march until their
    start/end fronts cross, so the late-iteration active fraction tracks
    the background fraction (capstone scene, bg 0.768: active 0.73 after
    iter 1, 0.61 after 4, 0.47 after 7). Each segment gets a tight tier
    from that decay plus a looser overflow tier from the early-training
    bound; overflowing the tight tier costs one tier up, never a full-R
    dense segment.

    Marching rays all intersect the bounding sphere, so ``intersect_frac``
    (see auto_fallback_capacity) additionally caps every segment — on
    wide-FoV scenes it also enables an iteration-0 segment (the march
    starts with exactly the intersecting rays active).
    """
    bg = 1.0 - object_frac

    def cap(x):
        if intersect_frac is not None:
            x = min(x, intersect_frac + granularity)
        x = np.ceil(x / granularity) * granularity
        return float(np.clip(x, 2 * granularity, 1.0))

    # tight tier from the measured trained-state decay (capstone scene,
    # bg 0.768: 0.73 after iter 1 = 0.95*bg, 0.61 after 4 = 0.8*bg,
    # 0.47 after 7 = 0.62*bg); over tier from the loose early-training
    # bound. Overflowing the tight tier costs one tier up, never a
    # full-R dense segment.
    sched = [(1, 0.95 * bg + 0.03, bg + 0.25),
             (5, 0.80 * bg + 0.03, bg + 0.05),
             (8, 0.62 * bg + 0.03, 0.75 * bg + 0.05)]
    if intersect_frac is not None and cap(1.0) < 0.95:
        sched.insert(0, (0, 1.0, 2.0))
    out = []
    for s, tight, over in sched:
        tight, over = cap(tight), cap(over)
        if tight < 0.95 and (not out or tight < out[-1][1][0]):
            out.append((s, (tight, over) if over > tight and over < 0.95
                        else (tight,)))
    return tuple(out)


# Shared with the renderer's supervised compaction; the old private names are
# kept as aliases for existing callers/tests and as the patch points of the
# layout A/B scripts (scripts/compaction_ab.py, scripts/scatter_into_ab.py).
_compact_call = compact_call
_compact_call_into = compact_call_into


def trace_rays(cfg: TracerConfig, sdf_fn, org, dirs, object_mask,
               training: bool, key: Optional[jax.Array] = None,
               minimal_steps: Optional[jnp.ndarray] = None,
               march_fn=None, secant_fn=None) -> TraceResult:
    """Full tracing pipeline (ref RayTracing.forward, ray_tracing.py:27-98).

    org (L..., 3) per-ray origins; dirs (L..., 3) unit directions;
    object_mask (L...) bool. L is typically (B, P) with P the sharded axis.
    ``minimal_steps`` overrides the random stratified steps of the miss
    filler (for determinism/golden tests); otherwise drawn from ``key``.
    ``march_fn(org, dirs, mask_intersect, t_near, t_far) -> (unfin_s, t_s,
    t_e)`` overrides the sphere-trace march (e.g. the fused Pallas kernel).
    """
    # Per-ray sphere intersection (ref rend_util.py:141-162, flat-ray form).
    r_sph = cfg.object_bounding_sphere
    d_dot_o = jnp.sum(dirs * org, axis=-1)
    under = d_dot_o ** 2 - (jnp.sum(org ** 2, axis=-1) - r_sph ** 2)
    mask_intersect = under > 0
    sq = jnp.sqrt(jnp.where(mask_intersect, under, 0.0))
    t_near = jnp.clip(jnp.where(mask_intersect, -d_dot_o - sq, 0.0), 0.0)
    t_far = jnp.clip(jnp.where(mask_intersect, -d_dot_o + sq, 0.0), 0.0)

    if march_fn is None:
        unfin_s, t_s, t_e = _sphere_trace(
            cfg, sdf_fn, org, dirs, mask_intersect, t_near, t_far)
    else:
        unfin_s, t_s, t_e = march_fn(org, dirs, mask_intersect, t_near,
                                     t_far)
    min_dis = jnp.where(mask_intersect, t_near, 0.0)
    max_dis = jnp.where(mask_intersect, t_far, 0.0)

    net_obj_mask = t_s < t_e
    points = org + t_s[..., None] * dirs
    dists = t_s

    # Fallback sampler for rays the march didn't finish (ref :44-61).
    sampler_mask = unfin_s
    lead = org.shape[:-1]
    R = int(np.prod(lead))

    fb_fracs = cfg.fallback_capacity_frac
    if not isinstance(fb_fracs, (tuple, list)):
        fb_fracs = (fb_fracs,) if fb_fracs > 0 else ()
    if training and fb_fracs:
        # --- unified fallback: sampler + min-SDF fill in ONE compacted
        # n_steps-sample evaluation (the two ray sets are disjoint; the
        # fill's mask algebra only reads pre-sampler march state on
        # non-sampler rays, so it is computable here). ---
        in_mask = ~net_obj_mask & object_mask & ~sampler_mask
        out_mask = ~object_mask & ~sampler_mask
        left_out = (in_mask | out_mask) & ~mask_intersect
        if cfg.fill_misses:
            fill = (in_mask | out_mask) & mask_intersect
        else:  # dead-compute skip: see TracerConfig.fill_misses
            fill = jnp.zeros_like(sampler_mask)
        min_dis = jnp.where(net_obj_mask & out_mask, dists, min_dis)
        if minimal_steps is None:
            if key is None:
                raise ValueError("training trace needs key or minimal_steps")
            minimal_steps = jax.random.uniform(key, (cfg.n_steps,))

        active = sampler_mask | fill
        t_lo = jnp.where(sampler_mask, t_s, min_dis)
        t_hi = jnp.where(sampler_mask, t_e, max_dis)
        cap = tuple(max(128, int(R * f)) for f in fb_fracs)
        fn = lambda o, d, m, sm, lo, hi: _unified_fallback(
            cfg, sdf_fn, o, d, m, sm, lo, hi, minimal_steps, training,
            secant_fn=secant_fn)
        # Predicated direct scatter into the live merge targets: rows
        # outside each output's merge mask keep the target value (OOB
        # sentinel + mode='drop'), replacing the zeros out_builders and the
        # three full-size where-merges of the round-4 layout (PERF.md r5).
        p_f, net_f, d_f = _compact_call_into(
            fn, active.reshape(R), cap,
            [org.reshape(R, 3), dirs.reshape(R, 3), object_mask.reshape(R),
             sampler_mask.reshape(R), t_lo.reshape(R), t_hi.reshape(R)],
            [points.reshape(R, 3), net_obj_mask.reshape(R),
             dists.reshape(R)],
            out_masks=[active.reshape(R), sampler_mask.reshape(R),
                       active.reshape(R)])
        points = p_f.reshape(lead + (3,))
        net_obj_mask = net_f.reshape(lead)
        dists = d_f.reshape(lead)

        # Rays missing the sphere: project the origin (ref :79-84).
        t_proj = -jnp.sum(dirs * org, axis=-1)
        points = jnp.where(left_out[..., None],
                           org + t_proj[..., None] * dirs, points)
        dists = jnp.where(left_out, t_proj, dists)
        return TraceResult(points, net_obj_mask, dists, sampler_mask,
                           mask_intersect)
    smp_t_min = jnp.where(sampler_mask, t_s, 0.0)
    smp_t_max = jnp.where(sampler_mask, t_e, 0.0)
    smp_fracs = cfg.sampler_capacity_frac
    if not isinstance(smp_fracs, (tuple, list)):
        smp_fracs = (smp_fracs,)
    smp_caps = tuple(max(128, int(R * f)) for f in smp_fracs
                     if int(R * f) < R)
    if not smp_caps:
        smp_pts, smp_net, smp_d = _ray_sampler(
            cfg, sdf_fn, org, dirs, object_mask, smp_t_min, smp_t_max,
            training, secant_fn=secant_fn)
        points = jnp.where(sampler_mask[..., None], smp_pts, points)
        dists = jnp.where(sampler_mask, smp_d, dists)
        net_obj_mask = jnp.where(sampler_mask, smp_net, net_obj_mask)
    else:
        cap = smp_caps
        fn = lambda o, d, m, lo, hi: _ray_sampler(
            cfg, sdf_fn, o, d, m, lo, hi, training, secant_fn=secant_fn)
        smpf = sampler_mask.reshape(R)
        p_f, net_f, d_f = _compact_call_into(
            fn, smpf, cap,
            [org.reshape(R, 3), dirs.reshape(R, 3),
             object_mask.reshape(R), smp_t_min.reshape(R),
             smp_t_max.reshape(R)],
            [points.reshape(R, 3), net_obj_mask.reshape(R),
             dists.reshape(R)],
            out_masks=[smpf, smpf, smpf])
        points = p_f.reshape(lead + (3,))
        net_obj_mask = net_f.reshape(lead)
        dists = d_f.reshape(lead)

    if not training:
        return TraceResult(points, net_obj_mask, dists, sampler_mask,
                           mask_intersect)

    # Training: every ray needs a point (ref :73-94).
    in_mask = ~net_obj_mask & object_mask & ~sampler_mask
    out_mask = ~object_mask & ~sampler_mask

    # Rays missing the sphere: project the origin onto the ray (ref :79-84).
    left_out = (in_mask | out_mask) & ~mask_intersect
    t_proj = -jnp.sum(dirs * org, axis=-1)
    points = jnp.where(left_out[..., None], org + t_proj[..., None] * dirs,
                       points)
    dists = jnp.where(left_out, t_proj, dists)

    # Remaining misses: min-SDF point along the ray (ref :86-94, 280-308).
    if not cfg.fill_misses:  # dead-compute skip: see TracerConfig.fill_misses
        return TraceResult(points, net_obj_mask, dists, sampler_mask,
                           mask_intersect)
    fill = (in_mask | out_mask) & mask_intersect
    min_dis = jnp.where(net_obj_mask & out_mask, dists, min_dis)
    if minimal_steps is None:
        if key is None:
            raise ValueError("training trace needs key or minimal_steps")
        minimal_steps = jax.random.uniform(key, (cfg.n_steps,))
    fill_fracs = cfg.fill_capacity_frac
    if not isinstance(fill_fracs, (tuple, list)):
        fill_fracs = (fill_fracs,)
    fill_caps = tuple(max(128, int(R * f)) for f in fill_fracs
                      if int(R * f) < R)
    if not fill_caps:
        mn_pts, mn_d = _minimal_sdf_points(cfg, sdf_fn, org, dirs, min_dis,
                                           max_dis, minimal_steps)
        points = jnp.where(fill[..., None], mn_pts, points)
        dists = jnp.where(fill, mn_d, dists)
    else:
        cap = fill_caps
        fn = lambda o, d, lo, hi: _minimal_sdf_points(
            cfg, sdf_fn, o, d, lo, hi, minimal_steps)
        fillf = fill.reshape(R)
        p_f, d_f = _compact_call_into(
            fn, fillf, cap,
            [org.reshape(R, 3), dirs.reshape(R, 3), min_dis.reshape(R),
             max_dis.reshape(R)],
            [points.reshape(R, 3), dists.reshape(R)],
            out_masks=[fillf, fillf])
        points = p_f.reshape(lead + (3,))
        dists = d_f.reshape(lead)

    return TraceResult(points, net_obj_mask, dists, sampler_mask,
                       mask_intersect)

"""Differentiable-surface ray tracing: bidirectional sphere tracing with a
uniform-sampling + secant fallback, as fixed-shape masked computation.

Behavioral parity target: reference ``code/model/ray_tracing.py`` (RayTracing).
The reference mutates boolean-indexed subsets ("unfinished" rays) with
data-dependent shapes and Python early-exits; here every ray keeps a lane and
converged lanes are frozen by masks, with a ``lax.while_loop`` providing the
early-exit *in time* (trip count) without dynamic shapes — the XLA-native
formulation. All SDF MLP evaluations are dense batched matmuls feeding the
MXU; large sample batches are chunked through ``lax.map`` to bound HBM.

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
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry.cameras import get_sphere_intersection


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
    sdf_chunk: int = 1 << 18  # dense-sampler SDF eval chunk (points)


class TraceResult(NamedTuple):
    points: jnp.ndarray          # (R, 3) surface / fallback points
    network_object_mask: jnp.ndarray  # (R,) bool: ray hit the SDF surface
    dists: jnp.ndarray           # (R,) distance along ray
    sampler_mask: jnp.ndarray    # (R,) bool: handled by the fallback sampler
    mask_intersect: jnp.ndarray  # (R,) bool: ray intersects bounding sphere


def chunked_sdf(sdf_fn: Callable, pts: jnp.ndarray, chunk: int):
    """Evaluate sdf_fn on (N, 3) points in fixed-size chunks via lax.map to
    bound peak activation memory (ref chunks at 100k: ray_tracing.py:217)."""
    n = pts.shape[0]
    if chunk <= 0 or n <= chunk:
        return sdf_fn(pts)
    pad = (-n) % chunk
    p = jnp.pad(pts, ((0, pad), (0, 0)))
    out = jax.lax.map(sdf_fn, p.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]


def _sphere_trace(cfg: TracerConfig, sdf_fn, org, dirs, mask_intersect,
                  t_near, t_far):
    """Bidirectional sphere tracing (ref ray_tracing.py:101-196).

    org, dirs: (R, 3); mask_intersect, t_near, t_far: (R,).
    Returns (unfinished_start, t_start, t_end) after <= sphere_tracing_iters
    marching steps; min/max distances are the initial (t_near, t_far).
    """
    thr = cfg.sdf_threshold
    clip = cfg.dist_clip

    def eval_masked(t, m):
        p = org + t[:, None] * dirs
        v = jnp.clip(sdf_fn(p), -clip, clip)
        return jnp.where(m, v, 0.0)

    unfin_s = mask_intersect
    unfin_e = mask_intersect
    t_s = jnp.where(mask_intersect, t_near, 0.0)
    t_e = jnp.where(mask_intersect, t_far, 0.0)
    next_s = eval_masked(t_s, unfin_s)
    next_e = eval_masked(t_e, unfin_e)

    def line_search(t, curr, next_v, sign):
        """Back-stepping line search halving the overshoot (ref :173-191).
        sign=+1 for the start march (t decreases), -1 for the end march."""
        def cond(state):
            j, _, not_proj, _ = state
            return (j < cfg.line_step_iters) & jnp.any(not_proj)

        def body(state):
            j, t, not_proj, next_v = state
            step = ((1 - cfg.line_search_step) / (2.0 ** j)) * curr
            t = jnp.where(not_proj, t - sign * step, t)
            p = org + t[:, None] * dirs
            v = jnp.clip(sdf_fn(p), -clip, clip)
            next_v = jnp.where(not_proj, v, next_v)
            return j + 1, t, next_v < 0, next_v

        not_proj = next_v < 0
        _, t, _, next_v = jax.lax.while_loop(
            cond, body, (0, t, not_proj, next_v))
        return t, next_v

    def cond(state):
        i, unfin_s, unfin_e, *_ = state
        return (i <= cfg.sphere_tracing_iters) & (
            jnp.any(unfin_s) | jnp.any(unfin_e))

    def body(state):
        i, unfin_s, unfin_e, t_s, t_e, next_s, next_e = state
        curr_s = jnp.where(unfin_s, next_s, 0.0)
        curr_s = jnp.where(curr_s <= thr, 0.0, curr_s)
        curr_e = jnp.where(unfin_e, next_e, 0.0)
        curr_e = jnp.where(curr_e <= thr, 0.0, curr_e)
        unfin_s = unfin_s & (curr_s > thr)
        unfin_e = unfin_e & (curr_e > thr)

        def march(args):
            unfin_s, unfin_e, t_s, t_e, next_s, next_e = args
            t_s2 = t_s + curr_s
            t_e2 = t_e - curr_e
            next_s2 = eval_masked(t_s2, unfin_s)
            next_e2 = eval_masked(t_e2, unfin_e)
            t_s2, next_s2 = line_search(t_s2, curr_s, next_s2, +1.0)
            t_e2, next_e2 = line_search(t_e2, curr_e, next_e2, -1.0)
            ok = t_s2 < t_e2
            return unfin_s & ok, unfin_e & ok, t_s2, t_e2, next_s2, next_e2

        # Only march while not at the final bookkeeping-only iteration
        # (reference breaks *after* the mask update at iters ==
        # sphere_tracing_iters; ray_tracing.py:153-155).
        do_march = (i < cfg.sphere_tracing_iters) & (
            jnp.any(unfin_s) | jnp.any(unfin_e))
        unfin_s, unfin_e, t_s, t_e, next_s, next_e = jax.lax.cond(
            do_march, march, lambda a: a,
            (unfin_s, unfin_e, t_s, t_e, next_s, next_e))
        return i + 1, unfin_s, unfin_e, t_s, t_e, next_s, next_e

    _, unfin_s, unfin_e, t_s, t_e, next_s, next_e = jax.lax.while_loop(
        cond, body, (0, unfin_s, unfin_e, t_s, t_e, next_s, next_e))
    return unfin_s, t_s, t_e


def _ray_sampler(cfg: TracerConfig, sdf_fn, org, dirs, object_mask,
                 t_min, t_max, training: bool):
    """Uniform interval sampling + secant (ref ray_tracing.py:198-278),
    dense over all rays; callers merge via sampler_mask.

    Returns (points (R,3), net_surface (R,), dists (R,))."""
    S = cfg.n_steps
    R = org.shape[0]
    steps = jnp.linspace(0.0, 1.0, S)
    ts = t_min[:, None] + steps[None, :] * (t_max - t_min)[:, None]  # (R, S)
    pts = org[:, None, :] + ts[..., None] * dirs[:, None, :]
    sdf_val = chunked_sdf(sdf_fn, pts.reshape(-1, 3),
                          cfg.sdf_chunk).reshape(R, S)

    # First sign transition: argmin of sign(sdf) * [S..1] returns the first
    # negative sample (ref :221-222).
    weight = jnp.arange(S, 0, -1, dtype=sdf_val.dtype)[None, :]
    ind = jnp.argmin(jnp.sign(sdf_val) * weight, axis=-1)
    ar = jnp.arange(R)
    net_surface = sdf_val[ar, ind] < 0

    # Rays without a usable crossing take the min-SDF sample (ref :229-235).
    p_out = ~(object_mask & net_surface)
    out_ind = jnp.argmin(sdf_val, axis=-1)
    pick = jnp.where(p_out, out_ind, ind)
    d = ts[ar, pick]
    p = pts[ar, pick]

    # Secant refinement on sign-crossing rays (ref :242-256; eval mode uses
    # net_surface alone).
    secant_sel = (net_surface & object_mask) if training else net_surface
    z_high = ts[ar, ind]
    sdf_high = sdf_val[ar, ind]
    ind_lo = (ind - 1) % S  # torch negative indexing wraps (ref :248)
    z_low = ts[ar, ind_lo]
    sdf_low = sdf_val[ar, ind_lo]
    z_pred = _secant(cfg, sdf_fn, org, dirs, z_low, z_high, sdf_low, sdf_high)
    d = jnp.where(secant_sel, z_pred, d)
    p = jnp.where(secant_sel[:, None], org + z_pred[:, None] * dirs, p)
    return p, net_surface, d


def _secant(cfg: TracerConfig, sdf_fn, org, dirs, z_low, z_high, sdf_low,
            sdf_high):
    """Fixed-iteration bracketed secant root find (ref ray_tracing.py:260-278).
    All (R,) arrays; division guarded for frozen/degenerate lanes."""
    def z_of(sl, sh, zl, zh):
        denom = sh - sl
        denom = jnp.where(jnp.abs(denom) < 1e-12,
                          jnp.where(denom < 0, -1e-12, 1e-12), denom)
        return -sl * (zh - zl) / denom + zl

    def body(_, state):
        z_low, z_high, sdf_low, sdf_high, z_pred = state
        p_mid = org + z_pred[:, None] * dirs
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
    R = org.shape[0]
    ts = steps01[None, :] * (t_max - t_min)[:, None] + t_min[:, None]
    pts = org[:, None, :] + ts[..., None] * dirs[:, None, :]
    sdf_val = chunked_sdf(sdf_fn, pts.reshape(-1, 3),
                          cfg.sdf_chunk).reshape(R, S)
    idx = jnp.argmin(sdf_val, axis=-1)
    ar = jnp.arange(R)
    return pts[ar, idx], ts[ar, idx]


def trace_rays(cfg: TracerConfig, sdf_fn, cam_loc, ray_dirs, object_mask,
               training: bool, key: Optional[jax.Array] = None,
               minimal_steps: Optional[jnp.ndarray] = None) -> TraceResult:
    """Full tracing pipeline (ref RayTracing.forward, ray_tracing.py:27-98).

    cam_loc (B, 3); ray_dirs (B, P, 3); object_mask (B*P,) bool.
    ``minimal_steps`` overrides the random stratified steps of the miss
    filler (for determinism/golden tests); otherwise drawn from ``key``.
    """
    B, P, _ = ray_dirs.shape
    R = B * P
    t_nf, mask_intersect = get_sphere_intersection(
        cam_loc, ray_dirs, r=cfg.object_bounding_sphere)
    org = jnp.broadcast_to(cam_loc[:, None, :], (B, P, 3)).reshape(R, 3)
    dirs = ray_dirs.reshape(R, 3)
    t_near = t_nf[..., 0].reshape(R)
    t_far = t_nf[..., 1].reshape(R)
    mask_intersect = mask_intersect.reshape(R)

    unfin_s, t_s, t_e = _sphere_trace(
        cfg, sdf_fn, org, dirs, mask_intersect, t_near, t_far)
    min_dis, max_dis = jnp.where(mask_intersect, t_near, 0.0), \
        jnp.where(mask_intersect, t_far, 0.0)

    net_obj_mask = t_s < t_e
    points = org + t_s[:, None] * dirs
    dists = t_s

    # Fallback sampler for rays the march didn't finish (ref :44-61).
    sampler_mask = unfin_s
    smp_pts, smp_net, smp_d = _ray_sampler(
        cfg, sdf_fn, org, dirs, object_mask,
        jnp.where(sampler_mask, t_s, 0.0),
        jnp.where(sampler_mask, t_e, 0.0), training)
    points = jnp.where(sampler_mask[:, None], smp_pts, points)
    dists = jnp.where(sampler_mask, smp_d, dists)
    net_obj_mask = jnp.where(sampler_mask, smp_net & sampler_mask,
                             net_obj_mask)

    if not training:
        return TraceResult(points, net_obj_mask, dists, sampler_mask,
                           mask_intersect)

    # Training: every ray needs a point (ref :73-94).
    in_mask = ~net_obj_mask & object_mask & ~sampler_mask
    out_mask = ~object_mask & ~sampler_mask

    # Rays missing the sphere: project the origin onto the ray (ref :79-84).
    left_out = (in_mask | out_mask) & ~mask_intersect
    t_proj = -jnp.einsum("rd,rd->r", dirs, org)
    points = jnp.where(left_out[:, None], org + t_proj[:, None] * dirs,
                       points)
    dists = jnp.where(left_out, t_proj, dists)

    # Remaining misses: min-SDF point along the ray (ref :86-94, 280-308).
    fill = (in_mask | out_mask) & mask_intersect
    min_dis = jnp.where(net_obj_mask & out_mask, dists, min_dis)
    if minimal_steps is None:
        if key is None:
            raise ValueError("training trace needs key or minimal_steps")
        minimal_steps = jax.random.uniform(key, (cfg.n_steps,))
    mn_pts, mn_d = _minimal_sdf_points(cfg, sdf_fn, org, dirs, min_dis,
                                       max_dis, minimal_steps)
    points = jnp.where(fill[:, None], mn_pts, points)
    dists = jnp.where(fill, mn_d, dists)

    return TraceResult(points, net_obj_mask, dists, sampler_mask,
                       mask_intersect)

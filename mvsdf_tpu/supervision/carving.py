"""MVS-depth carving: signed distance of sample points to precomputed depth
surfaces, vectorized over the (static) view axis.

Behavioral parity target: ``code/utils/my_utils.py:204-331`` (carving_t /
carving_t2). The reference streams per-view signed distances through a
RunningTopK(k=1) aggregator; with k=1 over a small static view axis that is
just a masked min/max reduction, which is what we compute.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import projections as proj


def carving(points_world, depths, cams, out_thresh_perc: float,
            use_invalid: bool = False):
    """points_world (M, 3); depths (V, 1, h, w); cams (V, 2, 4, 4).

    Returns (dist (M,), inside (M,) bool, support (M,) bool) where support is
    ``scene_in_range`` for carving_t (use_invalid=True) or ``scene_valid``
    for carving_t2 (the default; ref conf.py:16, loss.py:43-46).

    dist is the signed distance to the depth surface: the smallest positive
    (behind-surface) distance over inside-voting views if the point is
    classified inside, else the largest negative over outside-voting views.
    """
    V = depths.shape[0]
    _, _, h, w = depths.shape
    BIG = 1e30 / V  # MAX_FLOAT32 in the reference (my_utils.py:209)
    pts_hom = proj.to_hom(points_world)

    def per_view(depth, cam):
        pc = proj.world_to_cam(pts_hom, cam)           # (M, 4)
        point_depth = pc[..., 2]
        xy = proj.cam_to_img(pc, cam)[..., :2]
        grid_n = proj.normalize_pixel_coords(xy, h, w)
        in_range = proj.in_range_mask(grid_n)
        gathered = proj.grid_sample_nearest(depth, grid_n)[..., 0]
        valid = (gathered > 0) & in_range
        inside = (point_depth > gathered * 0.99) & valid
        outside = valid & ~inside
        dist = (point_depth - gathered) * valid
        return in_range, valid, inside, outside, dist

    in_range, valid, inside, outside, dist = jax.vmap(per_view)(depths, cams)

    total_in_range = jnp.sum(in_range, axis=0)
    total_valid = jnp.sum(valid, axis=0)
    total_inside = jnp.sum(inside, axis=0)

    pos = jnp.min(jnp.where(inside, dist, BIG), axis=0)
    neg = jnp.max(jnp.where(outside, dist, -BIG), axis=0)
    # RunningTopK.aggregate invalid fallback (my_utils.py:191-201): keep the
    # extremum if any view voted, else +/-BIG.
    pos = jnp.where(jnp.any(inside, axis=0), pos, BIG)
    neg = jnp.where(jnp.any(outside, axis=0), neg, -BIG)

    if use_invalid:  # carving_t (my_utils.py:204-266)
        total_outside_valid = total_valid - total_inside
        total_invalid = total_in_range - total_valid
        perc = (total_outside_valid + total_invalid * 0.5) / (
            total_in_range + 1e-9)
        support = total_in_range > 0
        scene_outside = (perc > out_thresh_perc) & support
        scene_inside = support ^ scene_outside
    else:  # carving_t2 (my_utils.py:269-331)
        perc = (total_valid - total_inside) / (total_valid + 1e-9)
        support = total_valid > 0
        scene_outside = (perc > out_thresh_perc) & support
        scene_inside = support ^ scene_outside

    ave_dist = pos * scene_inside + neg * scene_outside
    return ave_dist, scene_inside, support

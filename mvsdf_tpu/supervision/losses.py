"""The five-term MVSDF loss, fixed-shape masked.

Behavioral parity target: ``code/model/loss.py`` (IDRLoss). Reference
semantics preserved exactly, with boolean-indexed subsets replaced by lane
masks and the dynamic concatenations replaced by per-group masked sums whose
denominators are the (dynamic-valued, static-shaped) group populations.

  rgb      L1 over hit&mask rays / total ray count          (loss.py:21-28)
  eikonal  mean (|grad|-1)^2 over gated sample groups       (loss.py:30-35)
  depth    L1 between SDF and -carved distance, attenuated  (loss.py:37-63)
  feat     |1 - cos| of warped frozen-CNN features, inliers (loss.py:115-165)
  surf     BCE of surface-indicator logits                  (loss.py:167-174)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Gates, Schedule, Weights
from ..geometry import projections as proj
from .carving import carving


def _safe_norm(x, axis=-1, eps=1e-18):
    """L2 norm whose backward is finite at the zero vector.

    ``jnp.linalg.norm``'s vjp is x/||x|| — NaN at ||x||=0 — and a NaN
    survives multiplication by a zero mask cotangent, poisoning the whole
    gradient. torch's norm defines the subgradient 0 there, so the
    reference never hits this; out-of-range grid samples (exact zero
    feature vectors, masked out of the loss) did, discarding 976/1800
    updates on the round-3 capstone before this guard. Bit-identical to
    the plain norm whenever sum(x^2) > eps (the max passes sq through
    untouched)."""
    sq = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(sq, eps))


class LossTerms(NamedTuple):
    loss: jnp.ndarray
    rgb_loss: jnp.ndarray
    eikonal_loss: jnp.ndarray
    depth_loss: jnp.ndarray
    feat_loss: jnp.ndarray
    surf_loss: jnp.ndarray


def rgb_loss(rgb_values, rgb_gt, network_object_mask, object_mask):
    """(B, P, 3) each; L1 summed over hit&mask lanes, normalized by the total
    ray count B*P (ref loss.py:21-28)."""
    m = (network_object_mask & object_mask)[..., None]
    n = rgb_values.shape[0] * rgb_values.shape[1]
    return jnp.sum(jnp.abs(rgb_values - rgb_gt) * m) / n


def eikonal_loss(groups, gates: Gates):
    """Masked mean of (|grad|-1)^2 over the gated groups (ref loss.py:30-35;
    group gating ref implicit_differentiable_renderer.py:277-286)."""
    use = {"rt_surf": gates.eik_use_rt_surf, "eik": gates.eik_use_eik,
           "dsurf_on": gates.eik_use_dsurf_on,
           "dsurf_jitter": gates.eik_use_dsurf_jitter}
    num = 0.0
    den = 0.0
    for name, grp in groups.items():
        if not use.get(name, False):
            continue
        g = grp["grad"]
        m = grp["mask"]
        term = (_safe_norm(g) - 1.0) ** 2
        num = num + jnp.sum(term * m)
        den = den + jnp.sum(m)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def depth_loss(groups, gates: Gates, depths, depth_cams, size, center,
               sched: Schedule, weights: Weights):
    """MVS-depth carving loss over the gated sample groups
    (ref loss.py:37-63; group gating ref renderer :259-270).

    depths (V, 1, h, w), depth_cams (V, 2, 4, 4) — the batch images' own
    reference-view depth maps act as the carving views (loss.py:39-40).
    size scalar, center (3,).
    """
    use = {"rt_surf": gates.d_use_rt_surf, "eik": gates.d_use_eik,
           "dsurf_on": gates.d_use_dsurf_on,
           "dsurf_jitter": gates.d_use_dsurf_jitter}
    size = jnp.asarray(size).reshape(-1)[0]
    center = jnp.asarray(center).reshape(-1, 3)[0]
    num = 0.0
    den = 0.0
    smooth = None  # ref conf.py:25: smooth schedule is identically None
    for name, grp in groups.items():
        if not use.get(name, False):
            continue
        pts = jax.lax.stop_gradient(grp["points"])  # ref loss.py:38
        pts_world = pts / 2.0 * size + center       # ref loss.py:42
        dist, _, in_range = carving(pts_world, depths, depth_cams,
                                    out_thresh_perc=sched.out_thresh_perc,
                                    use_invalid=sched.use_invalid)
        dist_r = jnp.clip(dist / size * 2.0 +
                          (-1.25) * (~in_range).astype(jnp.float32),
                          -1.25, 1.25)              # ref loss.py:47
        far_mask = jnp.abs(dist_r) > sched.far_thresh
        far_w = jnp.where(far_mask, weights.far_att, 1.0)
        near_mask = jnp.abs(dist_r) < sched.near_thresh
        near_w = jnp.where(near_mask, weights.near_att, 1.0)
        if smooth is not None:
            d = (grp["sdf"] + dist_r) / smooth
            per = jnp.where(jnp.abs(d) < 1, 0.5 * d * d,
                            jnp.abs(d) - 0.5) * smooth
        else:
            per = jnp.abs(grp["sdf"] + dist_r)      # L1 vs -dist_r
        m = grp["mask"]
        num = num + jnp.sum(per * far_w * near_w * in_range * m)
        den = den + jnp.sum(m)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def feat_consistency_loss(diff_surf_pts, hit_mask, feat, cam, feat_src,
                          src_cams, size, center, feat_img_scale=2.0):
    """Multi-view feature-consistency loss (ref loss.py:115-165,
    get_feat_loss_corr — the variant actually used).

    diff_surf_pts (B, P, 3) unit-cube coords; hit_mask (B, P) bool;
    feat (B, C, h, w); cam (B, 2, 4, 4); feat_src (B, S, C, h, w);
    src_cams (B, S, 2, 4, 4); size scalar; center (3,).
    """
    B, P, _ = diff_surf_pts.shape
    S = feat_src.shape[1]
    h, w = feat.shape[-2:]
    size = jnp.asarray(size).reshape(-1)[0]
    center = jnp.asarray(center).reshape(-1, 3)[0]

    def per_image(pts, hmask, f_ref, c_ref, f_srcs, c_srcs):
        pts_world = pts / 2.0 * size + center
        pts_hom = proj.to_hom(pts_world)

        def project_sample(fmap, cam):
            pc = proj.world_to_cam(pts_hom, cam)
            xy = proj.cam_to_img(pc, cam)[..., :2]
            # features live at 1/feat_img_scale of the hd cams (loss.py:142)
            grid_n = proj.normalize_pixel_coords(xy / feat_img_scale, h, w)
            inr = proj.in_range_mask(grid_n)
            g = proj.grid_sample_bilinear(fmap, grid_n)  # (P, C)
            return g, inr

        g_ref, inr_ref = project_sample(f_ref, c_ref)
        g_srcs, inr_srcs = jax.vmap(project_sample)(f_srcs, c_srcs)

        n_ref = _safe_norm(g_ref)
        n_src = _safe_norm(g_srcs)
        corr = jnp.sum(g_ref[None] * g_srcs, axis=-1) / \
            jnp.clip(n_ref[None], 1e-9) / jnp.clip(n_src, 1e-9)
        corr_loss = jnp.abs(1.0 - corr)               # (S, P)
        valid = inr_ref[None] & inr_srcs
        inlier = corr_loss < 0.5                      # ref loss.py:153
        sel = valid & inlier & hmask[None]
        hits = jnp.sum(hmask)
        # ref .mean() over (S, m_i) elements incl. masked-out -> /(S * m_i)
        s = jnp.sum(corr_loss * sel)
        return jnp.where(hits > 0, s / jnp.maximum(S * hits, 1.0), 0.0)

    per = jax.vmap(per_image)(diff_surf_pts, hit_mask, feat, cam, feat_src,
                              src_cams)
    return jnp.mean(per)


def _bce_with_logits(x, y):
    return jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))


def surf_indicator_loss(logits_pos, pos_mask, logits_neg):
    """BCE: traced-surface-in-mask lanes -> 1, eikonal points -> 0
    (ref loss.py:167-174)."""
    pos = _bce_with_logits(logits_pos, 1.0) * pos_mask
    neg = _bce_with_logits(logits_neg, 0.0)
    n = jnp.sum(pos_mask) + logits_neg.size
    return (jnp.sum(pos) + jnp.sum(neg)) / jnp.maximum(n, 1.0)


def total_loss(out, ground_truth, gates: Gates, sched: Schedule,
               weights: Weights) -> LossTerms:
    """Assemble the weighted total (ref loss.py:176-219).

    out: RenderOut from render_forward (training mode).
    ground_truth: rgb (B, P, 3), depths (B, V, 1, h, w) whose (B, V) axes are
    merged into carving views (ref loss.py:39-40), depth_cams, size, center,
    feat, cam, feat_src, src_cams.
    """
    rgb_gt = ground_truth["rgb"]
    l_rgb = rgb_loss(out.rgb_values, rgb_gt, out.network_object_mask,
                     out.object_mask)
    l_eik = eikonal_loss(out.groups, gates)

    depths = ground_truth["depths"]
    depth_cams = ground_truth["depth_cams"]
    V = depths.shape[0] * depths.shape[1]
    l_depth = depth_loss(
        out.groups, gates,
        depths.reshape((V,) + depths.shape[2:]),
        depth_cams.reshape((V,) + depth_cams.shape[2:]),
        ground_truth["size"], ground_truth["center"], sched, weights)

    if gates.enable_feat:
        hit = out.network_object_mask & out.object_mask
        l_feat = feat_consistency_loss(
            out.diff_surf_pts, hit,
            ground_truth["feat"], ground_truth["cam"],
            ground_truth["feat_src"], ground_truth["src_cams"],
            ground_truth["size"], ground_truth["center"],
            feat_img_scale=float(sched.feat_img_scale))
    else:
        l_feat = jnp.zeros(())

    if gates.enable_surf:
        l_surf = surf_indicator_loss(out.surf_logits_pos,
                                     out.surf_logits_pos_mask,
                                     out.surf_logits_neg)
    else:
        l_surf = jnp.zeros(())

    loss = (l_rgb * weights.rgb + l_eik * weights.eikonal +
            l_surf * weights.surf + l_feat * weights.feat +
            l_depth * weights.depth)
    return LossTerms(loss=loss, rgb_loss=l_rgb, eikonal_loss=l_eik,
                     depth_loss=l_depth, feat_loss=l_feat, surf_loss=l_surf)

"""Differentiable SDF renderer orchestration (the IDRNetwork equivalent).

Behavioral parity target: ``code/model/implicit_differentiable_renderer.py:
169-338`` (IDRNetwork.forward + get_rbg_value). Differences are structural,
not semantic: every ray keeps a fixed lane with boolean masks instead of
boolean-indexed subsets, sample groups are fixed-size arrays with weight
masks, and randomness comes from an explicit PRNG key (overridable for
determinism tests).

Data layout is (B, P): B images per batch, P rays per image, with P the
data-parallel shard axis — per-image quantities (poses, feature maps, depth
cams) stay replicated and every per-ray operation is elementwise over (B, P),
so sharding propagates with zero resharding (see parallel/).

Sample groups feeding the depth-carving / eikonal losses (ref :215-286):
  rt_surf       SDF + grad at the traced ray points (mask = surface hits)
  eik           uniform random points in the bounding cube, B*P//2 of them
  dsurf_on      MVS depth maps unprojected to world, unit-normalized (phase A)
  dsurf_jitter  same points + U(-0.1, 0.1) jitter (phase A)
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig, Gates
from ..fields.sdf import implicit_apply, sdf_apply, full_value_and_grad
from ..fields.radiance import render_apply
from ..geometry.cameras import get_camera_params
from ..geometry import projections as proj
from ..tracing.sphere_trace import trace_rays
from .implicit_diff import differentiable_surface_points
from ..compaction import compact_call_into as _compact_call_into

# Columns of the implicit net's output scattered to full ray size at the
# supervised-compaction rt_surf site: 2 (SDF + indicator logit — all that
# is consumed full-size) or None for all 2+feature columns (the pre-round-5
# layout; kept as the A/B patch point of scripts/slice_scatter_ab.py).
_RT_SURF_SCATTER_COLS = 2


class RenderOut(NamedTuple):
    points: jnp.ndarray                 # (B, P, 3) traced/filled ray points
    rgb_values: jnp.ndarray             # (B, P, 3); non-hits = 1 (ref :302)
    sdf_output: jnp.ndarray             # (B, P) live-gradient SDF at points
    network_object_mask: jnp.ndarray    # (B, P) bool
    object_mask: jnp.ndarray            # (B, P) bool (ones if use_mask off)
    object_mask_true: jnp.ndarray       # (B, P) bool (the real mask)
    surface_mask: jnp.ndarray           # (B, P) bool: differentiable surface
    dists: jnp.ndarray                  # (B, P)
    diff_surf_pts: jnp.ndarray          # (B, P, 3) implicit-diff points
    groups: Optional[Dict]              # sample groups (training only)
    surf_logits_pos: Optional[jnp.ndarray]       # (B, P) indicator logits
    surf_logits_pos_mask: Optional[jnp.ndarray]  # (B, P) bool label-1 lanes
    surf_logits_neg: Optional[jnp.ndarray]       # (B, P//2) eik-point logits


def _unproject_depth_maps(depths, depth_cams):
    """depths (N, 1, h, w), depth_cams (N, 2, 4, 4) -> world points
    (N, h, w, 3) + validity (N, h, w). Ref :234-237 via my_utils idx_* chain.
    """
    _, _, h, w = depths.shape
    grid = proj.pixel_grid(h, w)  # (h, w, 3)

    def one(depth, cam):
        d = depth[0]
        pc = proj.img_to_cam(grid, d, cam)
        pw = proj.cam_to_world(pc, cam)
        return pw[..., :3], d > 0

    return jax.vmap(one)(depths, depth_cams)


def _sample_masked(points, valid, n, key):
    """Uniformly sample n rows of ``points`` among ``valid`` without
    replacement (fixed shape). Returns (pts (n, 3), ok (n,) bool).

    Replaces the reference's np.random.choice(replace=False) (ref :244) with
    a uniform-key top-k, which is an exact uniform draw without replacement.
    """
    m = points.shape[0]
    u = jax.random.uniform(key, (m,))
    score = jnp.where(valid, u, -1.0)
    _, idx = jax.lax.top_k(score, n)
    return points[idx], valid[idx]


def _dsurf_samples(cfg: ModelConfig, inputs, n_dsurf, key, noise):
    """Depth-surface sample groups (ref :226-251). Returns flat (n_dsurf, 3)
    arrays + validity; callers reshape to the (B, P//2) lane layout."""
    depths = inputs["depths"]        # (B, V, 1, h, w)
    cams = inputs["depth_cams"]      # (B, V, 2, 4, 4)
    center = jnp.asarray(inputs["center"]).reshape(-1, 3)[0]
    size = jnp.asarray(inputs["size"]).reshape(-1)[0]
    B, V = depths.shape[:2]
    d_flat = depths.reshape((B * V,) + depths.shape[2:])
    c_flat = cams.reshape((B * V,) + cams.shape[2:])
    pts, valid = _unproject_depth_maps(d_flat, c_flat)
    pts = pts.reshape(-1, 3)
    valid = valid.reshape(-1)
    pts_norm = (pts - center) / size * 2.0
    r = cfg.tracer.object_bounding_sphere
    jitter_rad = 0.1  # ref :228 (hard-coded)
    k_j, k_on, k_ji = jax.random.split(key, 3)
    if noise and "dsurf_jitter_noise" in noise:
        jn = noise["dsurf_jitter_noise"]
    else:
        jn = jax.random.uniform(k_j, pts_norm.shape) * 2 * jitter_rad - \
            jitter_rad
    pts_jit = pts_norm + jn
    out = []
    for p, k, idx_key in ((pts_norm, k_on, "dsurf_on_idx"),
                          (pts_jit, k_ji, "dsurf_jitter_idx")):
        if noise and idx_key in noise:
            # Golden-parity replay: global flat indices of the reference's
            # np.random.choice draw (ref :244), mapped to this layout by the
            # test harness. Selected rows are valid+inbound by construction.
            idx = noise[idx_key]
            out.append((p[idx], jnp.ones(idx.shape[0], bool)))
            continue
        inb = jnp.sum((jnp.abs(p) < r).astype(jnp.float32), -1) > 2.9
        out.append(_sample_masked(p, valid & inb, n_dsurf, k))
    (on_pts, on_ok), (ji_pts, ji_ok) = out
    return on_pts, on_ok, ji_pts, ji_ok


def _frozen_trace(cfg: ModelConfig, params_sg, org, dirs, object_mask,
                  training, min_steps):
    """The no-grad trace on frozen params, optionally via Pallas kernels."""
    icfg, tcfg = cfg.implicit, cfg.tracer
    march_fn = None
    secant_fn = None
    if cfg.use_pallas_trace:
        import dataclasses as _dc
        from ..tracing.pallas import pack_sdf_weights, pallas_sdf_apply
        # The sample-axis lax.map chunking exists to bound the XLA path's
        # per-layer (N, 512) HBM activations; the Pallas kernel streams
        # block-sized tiles with weights VMEM-resident, so chunking only
        # serializes one big launch into cfg.n_steps/chunk dependent small
        # ones. Run the fallback's full (rays, n_steps) evaluation as ONE
        # kernel launch (bit-identical rows either way).
        if tcfg.sample_chunk:
            tcfg = _dc.replace(tcfg, sample_chunk=0)
        packed = pack_sdf_weights(icfg, params_sg["implicit"])
        sdf_frozen = lambda x: pallas_sdf_apply(
            icfg, packed, x, block=cfg.pallas_block,
            interpret=cfg.pallas_interpret,
            in_kernel_pe=cfg.pallas_in_kernel_pe)
        if cfg.use_pallas_march:
            from ..tracing.pallas.march_kernel import pallas_sphere_trace
            march_fn = lambda o, d, mi, tn, tf: pallas_sphere_trace(
                tcfg, icfg, packed, o, d, mi, tn, tf,
                block=cfg.pallas_march_block,
                interpret=cfg.pallas_interpret)
        if cfg.use_pallas_secant:
            from ..tracing.pallas.secant_kernel import pallas_secant
            secant_fn = lambda o, d, zl, zh, sl, sh: pallas_secant(
                tcfg, icfg, packed, o, d, zl, zh, sl, sh,
                block=cfg.pallas_block, interpret=cfg.pallas_interpret)
    else:
        sdf_frozen = lambda x: sdf_apply(icfg, params_sg["implicit"], x)
    return trace_rays(tcfg, sdf_frozen, org, dirs, object_mask,
                      training=training, minimal_steps=min_steps,
                      march_fn=march_fn, secant_fn=secant_fn)


def render_forward(cfg: ModelConfig, params, inputs, *, training: bool,
                   gates: Gates = Gates(), key: Optional[jax.Array] = None,
                   noise: Optional[dict] = None,
                   mesh: Optional[jax.sharding.Mesh] = None) -> RenderOut:
    """One renderer forward pass over a batch of pixel rays.

    params: {"implicit": [...], "render": [...]} weight pytrees.
    inputs: uv (B,P,2), intrinsics (B,4,4), pose (B,4,4)|(B,7),
            object_mask (B,P); + depths/depth_cams/center/size when
            dsurf sampling is gated on.
    mesh + cfg.shard_map_trace runs the trace under shard_map (per-device
    loops/compaction/kernels; exact).
    """
    icfg, rcfg, tcfg = cfg.implicit, cfg.render, cfg.tracer
    uv = inputs["uv"]
    B, P, _ = uv.shape

    object_mask_true = inputs["object_mask"].reshape(B, P)
    object_mask = object_mask_true if cfg.use_mask else jnp.ones(
        (B, P), bool)

    ray_dirs, cam_loc = get_camera_params(uv, inputs["pose"],
                                          inputs["intrinsics"])
    org = jnp.broadcast_to(cam_loc[:, None, :], (B, P, 3))

    # --- non-differentiable trace on frozen params (ref :192-198) ---------
    params_sg = jax.lax.stop_gradient(params)
    if noise and "minimal_steps" in noise:
        min_steps = noise["minimal_steps"]
    else:
        if key is None and training:
            raise ValueError("training render_forward needs key or noise")
        if key is not None:
            key, k_trace = jax.random.split(key)
            min_steps = jax.random.uniform(k_trace, (tcfg.n_steps,))
        else:
            min_steps = None
    org_sg = jax.lax.stop_gradient(org)
    dirs_sg = jax.lax.stop_gradient(ray_dirs)
    if mesh is not None and cfg.shard_map_trace:
        from jax import shard_map
        from jax.sharding import PartitionSpec as PS
        from ..parallel.mesh import DATA_AXIS
        from ..tracing.sphere_trace import TraceResult

        ray3 = PS(None, DATA_AXIS, None)
        ray = PS(None, DATA_AXIS)
        repl = PS()
        p_repl = jax.tree_util.tree_map(lambda _: repl, params_sg)
        tr = shard_map(
            lambda p, o, d, m, s: _frozen_trace(cfg, p, o, d, m,
                                                training, s),
            mesh=mesh,
            in_specs=(p_repl, ray3, ray3, ray, repl),
            out_specs=TraceResult(
                points=ray3, network_object_mask=ray, dists=ray,
                sampler_mask=ray, mask_intersect=ray),
            check_vma=False,
        )(params_sg, org_sg, dirs_sg, object_mask, min_steps)
    else:
        with jax.named_scope("frozen_trace"):
            tr = _frozen_trace(cfg, params_sg, org_sg, dirs_sg, object_mask,
                               training, min_steps)
    dists = jax.lax.stop_gradient(tr.dists)
    net_obj_mask = tr.network_object_mask

    # Recompute points from dists so camera grads could flow (ref :200).
    points = org + dists[..., None] * ray_dirs

    groups = None
    surf_logits_pos = surf_logits_pos_mask = surf_logits_neg = None

    if training:
        surface_mask = net_obj_mask & object_mask
        r = tcfg.object_bounding_sphere

        if noise and "eik_points" in noise:
            eik_pts = noise["eik_points"].reshape(B, P // 2, 3)
        else:
            key, k_eik = jax.random.split(key)
            eik_pts = jax.random.uniform(k_eik, (B, P // 2, 3),
                                         minval=-r, maxval=r)

        group_list = [("rt_surf", points, surface_mask.astype(jnp.float32)),
                      ("eik", eik_pts, jnp.ones((B, P // 2)))]

        if gates.use_dsurf:
            if key is not None:
                key, k_ds = jax.random.split(key)
            else:
                # noise-replay mode must supply every dsurf draw
                for nk in ("dsurf_jitter_noise", "dsurf_on_idx",
                           "dsurf_jitter_idx"):
                    if nk not in noise:
                        raise ValueError(
                            f"noise-replay dsurf sampling needs {nk!r}")
                k_ds = jax.random.key(0)  # never consumed
            on_pts, on_ok, ji_pts, ji_ok = _dsurf_samples(
                cfg, inputs, (B * P) // 2, k_ds, noise)
            group_list.append(("dsurf_on", on_pts.reshape(B, P // 2, 3),
                               on_ok.reshape(B, P // 2).astype(jnp.float32)))
            group_list.append(("dsurf_jitter", ji_pts.reshape(B, P // 2, 3),
                               ji_ok.reshape(B, P // 2).astype(jnp.float32)))

        comp_fracs = cfg.supervised_compact_frac
        if comp_fracs:
            # Supervised compaction: every consumer of the rt_surf group
            # multiplies non-surface lanes by an exactly-zero mask (see
            # ModelConfig.supervised_compact_frac), so the live-gradient
            # forward (and, through AD, its backward) runs only on
            # surface lanes gathered into a fixed block; zero rows are
            # scattered back for the masked lanes. Cascade/dense-overflow
            # semantics identical to the trace-side compaction.
            N = B * P
            caps = tuple(max(128, int(N * f)) for f in comp_fracs)
            act_flat = surface_mask.reshape(N)

            ncols = _RT_SURF_SCATTER_COLS or (2 + icfg.feature_vector_size)

            def _sdf_logit_grad(p):
                # Only the SDF + indicator-logit columns are consumed at
                # full ray size (the 256 feature columns are recomputed
                # inside the shading compaction below): slicing BEFORE the
                # scatter keeps the per-tier full-size intermediates at
                # (N, 2) instead of (N, 258) — the round-5 op profile put
                # ~1.9 ms/step of broadcast/copy mass on each supervised
                # tier branch's full-width materializations.
                out, g = full_value_and_grad(icfg, params["implicit"], p)
                return out[..., :ncols], g

            # zeros targets, unpredicated write: every consumer of these
            # outputs multiplies non-surface lanes by an exactly-zero mask,
            # so block-padding rows' (finite) values are dead either way.
            o_flat, gr_flat = _compact_call_into(
                _sdf_logit_grad,
                act_flat, caps, [points.reshape(N, 3)],
                [jnp.zeros((N, ncols)), jnp.zeros((N, 3))],
                remat=cfg.supervised_remat)
            full_out = o_flat.reshape(B, P, ncols)
            g_rt = gr_flat.reshape(B, P, 3)
            groups = {"rt_surf": {
                "points": points, "sdf": full_out[..., 0], "grad": g_rt,
                "mask": surface_mask.astype(jnp.float32)}}
            rest = group_list[1:]
            rest_pts = jnp.concatenate([p for _, p, _ in rest], axis=1)
            rest_out, rest_g = full_value_and_grad(icfg, params["implicit"],
                                                   rest_pts)
            off = 0
            for name, pts, mask in rest:
                sl = slice(off, off + pts.shape[1])
                groups[name] = {"points": pts, "sdf": rest_out[:, sl, 0],
                                "grad": rest_g[:, sl], "mask": mask}
                off += pts.shape[1]
            eik_out = rest_out[:, :P // 2]
        else:
            # ONE batched linearized forward for every sample group (the
            # reference runs them as separate MLP calls, ref :256,275):
            # groups are concatenated along the ray axis — per-row results
            # are identical, and on TPU one large matmul chain beats 2-4
            # small ones in both launches and MXU utilization.
            widths = [p.shape[1] for _, p, _ in group_list]
            all_pts = jnp.concatenate([p for _, p, _ in group_list], axis=1)
            all_out, all_g = full_value_and_grad(icfg, params["implicit"],
                                                 all_pts)
            groups = {}
            off = 0
            for (name, pts, mask), wdt in zip(group_list, widths):
                sl = slice(off, off + wdt)
                groups[name] = {"points": pts, "sdf": all_out[:, sl, 0],
                                "grad": all_g[:, sl], "mask": mask}
                off += wdt
            full_out = all_out[:, :P]
            g_rt = all_g[:, :P]
            eik_out = all_out[:, P:P + P // 2]
        sdf_output = full_out[..., 0]

        # Surface-indicator logits (ref :272): traced hits inside the true
        # mask are label-1, eik random points label-0.
        surf_logits_pos = full_out[..., 1]
        surf_logits_pos_mask = surface_mask & object_mask_true
        surf_logits_neg = eik_out[..., 1]

        # Implicit-diff surface points (ref :288-293).
        g_rt_detached = jax.lax.stop_gradient(groups["rt_surf"]["grad"])
        diff_surf_pts = differentiable_surface_points(
            sdf_output, jax.lax.stop_gradient(sdf_output), g_rt_detached,
            dists, org, ray_dirs, valid_mask=surface_mask,
            min_dot=cfg.implicit_diff_min_dot)
    else:
        full_out = implicit_apply(icfg, params["implicit"], points)
        sdf_output = full_out[..., 0]
        surface_mask = net_obj_mask
        diff_surf_pts = points

    # --- shading (ref get_rbg_value :324-338) -----------------------------
    view = -ray_dirs
    detach_geo = (training and gates.detach_geometry_for_rgb) or \
        cfg.disable_rgb_grad
    if training and cfg.supervised_compact_frac:
        # Shading reads only surface lanes too (rgb_values is pinned to 1
        # elsewhere and the rgb/feat losses mask by the hit set): compact
        # the SDF re-evaluation + rendering MLP the same way.
        N = B * P
        caps = tuple(max(128, int(N * f))
                     for f in cfg.supervised_compact_frac)

        def _shade(p, v):
            out_s, nrm = full_value_and_grad(icfg, params["implicit"], p)
            feats = out_s[..., 2:]
            pi, ni, vi = p, nrm, v
            if detach_geo:
                pi, ni, vi = map(jax.lax.stop_gradient, (pi, ni, vi))
            return (render_apply(rcfg, params["render"], pi, ni, vi,
                                 feats),)

        # Direct predicated scatter into the non-hit fill value (rgb=1,
        # ref :302-304): fuses the rgb_values where-merge into the scatter.
        sm_flat = surface_mask.reshape(N)
        (rgbv_flat,) = _compact_call_into(
            _shade, sm_flat, caps,
            [diff_surf_pts.reshape(N, 3), view.reshape(N, 3)],
            [jnp.ones((N, 3))], out_masks=[sm_flat],
            remat=cfg.supervised_remat)
        rgb_values = rgbv_flat.reshape(B, P, 3)
    else:
        rgb_out, normals = full_value_and_grad(icfg, params["implicit"],
                                               diff_surf_pts)
        features = rgb_out[..., 2:]
        pts_in, nrm_in, view_in = diff_surf_pts, normals, view
        if detach_geo:
            pts_in, nrm_in, view_in = map(jax.lax.stop_gradient,
                                          (pts_in, nrm_in, view_in))
        rgb = render_apply(rcfg, params["render"], pts_in, nrm_in, view_in,
                           features)
        rgb_values = jnp.where(surface_mask[..., None], rgb, 1.0)

    return RenderOut(
        points=points, rgb_values=rgb_values, sdf_output=sdf_output,
        network_object_mask=net_obj_mask, object_mask=object_mask,
        object_mask_true=object_mask_true, surface_mask=surface_mask,
        dists=dists, diff_surf_pts=diff_surf_pts, groups=groups,
        surf_logits_pos=surf_logits_pos,
        surf_logits_pos_mask=surf_logits_pos_mask,
        surf_logits_neg=surf_logits_neg)

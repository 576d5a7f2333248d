"""MVS-style camera projections and image sampling, fixed-shape and jittable.

The MVS camera format is a (2, 4, 4) tensor: cam[0] = world-to-camera
extrinsic, cam[1][:3, :3] = intrinsic K (ref ``code/utils/my_utils.py:365-409``
loader). The projection chain semantics mirror ``my_utils.py:82-110``
(idx_img2cam / idx_cam2world / idx_world2cam / idx_cam2img) but operate on
plain (..., 3)/(..., 4) coordinate arrays instead of (n, h, w, 4, 1) towers.

Image sampling matches torch.nn.functional.grid_sample semantics with
align_corners=False and zero padding (nearest + bilinear), which is what the
carving loss (``my_utils.py:230``) and the feature-consistency loss
(``loss.py:145``) rely on.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Projection chain (jnp)
# ---------------------------------------------------------------------------

def to_hom(x):
    """(..., 3) -> (..., 4) homogeneous."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def world_to_cam(pts_hom, cam):
    """pts_hom (..., 4), cam (2, 4, 4) -> camera-frame hom coords (..., 4),
    w-normalized. Ref ``my_utils.py:98-102``."""
    p = jnp.einsum("ij,...j->...i", cam[0], pts_hom)
    return p / (p[..., -1:] + 1e-9)


def cam_to_world(pts_hom, cam, extr_inv=None):
    """Inverse of world_to_cam. Ref ``my_utils.py:91-95``."""
    E = jnp.linalg.inv(cam[0]) if extr_inv is None else extr_inv
    p = jnp.einsum("ij,...j->...i", E, pts_hom)
    return p / (p[..., -1:] + 1e-9)


def cam_to_img(pts_cam_hom, cam):
    """Camera-frame hom coords (..., 4) -> pixel coords (..., 3) hom
    (x, y, 1). Ref ``my_utils.py:105-110``."""
    p3 = pts_cam_hom[..., :3] / (pts_cam_hom[..., 3:4] + 1e-9)
    p = jnp.einsum("ij,...j->...i", cam[1, :3, :3], p3)
    return p / (p[..., -1:] + 1e-9)


def img_to_cam(xy_hom, depth, cam, intr_inv=None):
    """Pixel hom coords (..., 3) (x, y, 1) + depth (...,) -> camera hom
    (..., 4). Ref ``my_utils.py:82-88``."""
    Kinv = jnp.linalg.inv(cam[1, :3, :3]) if intr_inv is None else intr_inv
    p = jnp.einsum("ij,...j->...i", Kinv, xy_hom)
    p = p / (p[..., -1:] + 1e-9) * depth[..., None]
    return to_hom(p)


def pixel_grid(height: int, width: int):
    """(h, w, 3) homogeneous pixel-center coords (x+0.5, y+0.5, 1).
    Ref ``my_utils.py:71-79``."""
    x = jnp.arange(width, dtype=jnp.float32) + 0.5
    y = jnp.arange(height, dtype=jnp.float32) + 0.5
    xx, yy = jnp.meshgrid(x, y)
    return jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)


def scale_camera(cam, scale):
    """Scale intrinsics of an MVS camera (2, 4, 4) (numpy or jnp) by a factor
    (or (sx, sy)). Ref ``my_utils.py:32-61``."""
    if not isinstance(scale, (tuple, list)):
        scale = (scale, scale)
    if isinstance(cam, np.ndarray):
        new = cam.copy()
    else:
        new = jnp.array(cam)
    upd = [((1, 0, 0), scale[0]), ((1, 1, 1), scale[1]),
           ((1, 0, 2), scale[0]), ((1, 1, 2), scale[1])]
    if isinstance(new, np.ndarray):
        for idx, s in upd:
            new[(Ellipsis,) + idx] = cam[(Ellipsis,) + idx] * s
    else:
        for idx, s in upd:
            new = new.at[(Ellipsis,) + idx].set(cam[(Ellipsis,) + idx] * s)
    return new


# ---------------------------------------------------------------------------
# Grid normalization + in-range tests (torch grid_sample conventions)
# ---------------------------------------------------------------------------

def normalize_pixel_coords(xy, height: int, width: int):
    """Pixel coords (..., 2) -> normalized [-1, 1] coords, clamped to
    [-1.1, 1.1]. Ref ``my_utils.py:152-156``."""
    size = jnp.array([width, height], dtype=xy.dtype)
    g = xy / size * 2 - 1
    return jnp.clip(g, -1.1, 1.1)


def in_range_mask(grid_n):
    """Normalized coords (..., 2) -> bool mask of coords within [-1, 1].
    Ref ``my_utils.py:159-165``."""
    ok = jnp.all((grid_n >= -1) & (grid_n <= 1), axis=-1)
    return ok


# ---------------------------------------------------------------------------
# grid_sample equivalents (zero padding, align_corners=False)
# ---------------------------------------------------------------------------

def _unnormalize(coord, size):
    # torch align_corners=False: ix = ((x + 1) * W - 1) / 2
    return ((coord + 1) * size - 1) / 2


def grid_sample_nearest(img, grid_n):
    """img (C, H, W); grid_n (..., 2) normalized coords -> (..., C).

    Nearest-neighbor with zero padding; rounding is round-half-to-even to
    match torch's nearbyint.
    """
    C, H, W = img.shape
    ix = jnp.round(_unnormalize(grid_n[..., 0], W)).astype(jnp.int32)
    iy = jnp.round(_unnormalize(grid_n[..., 1], H)).astype(jnp.int32)
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    out = img[:, iyc, ixc]  # (C, ...)
    out = jnp.moveaxis(out, 0, -1)
    return jnp.where(valid[..., None], out, 0.0)


def grid_sample_bilinear(img, grid_n):
    """img (C, H, W); grid_n (..., 2) normalized coords -> (..., C).

    Bilinear with zero padding, align_corners=False (matches
    F.grid_sample(..., mode='bilinear', padding_mode='zeros')).
    """
    C, H, W = img.shape
    fx = _unnormalize(grid_n[..., 0], W)
    fy = _unnormalize(grid_n[..., 1], H)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0
    out = 0.0
    for dx, wx in ((0, 1 - wx1), (1, wx1)):
        for dy, wy in ((0, 1 - wy1), (1, wy1)):
            ix = x0.astype(jnp.int32) + dx
            iy = y0.astype(jnp.int32) + dy
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            ixc = jnp.clip(ix, 0, W - 1)
            iyc = jnp.clip(iy, 0, H - 1)
            v = jnp.moveaxis(img[:, iyc, ixc], 0, -1)
            w = (wx * wy)[..., None] * valid[..., None]
            out = out + v * w
    return out

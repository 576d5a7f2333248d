"""Camera math: ray generation, projection-matrix decomposition, sphere
intersection, quaternion <-> rotation.

Behavioral parity targets (semantics only; implementation is fresh jnp):
  - ray generation: reference ``code/utils/rend_util.py:48-100``
  - P = K[R|t] decomposition: ``code/utils/rend_util.py:25-46``
  - ray/sphere intersection: ``code/utils/rend_util.py:141-162``
  - quaternion helpers: ``code/utils/rend_util.py:102-139``

All jnp functions are shape-polymorphic over leading batch dims and safe under
jit/vmap (no data-dependent control flow).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# numpy-side (data loading; not jitted)
# ---------------------------------------------------------------------------

def decompose_projection(P: np.ndarray):
    """Decompose a 3x4 projection matrix P = K [R | t] into intrinsics and
    camera-to-world pose (same convention as cv2.decomposeProjectionMatrix as
    used by the reference at ``rend_util.py:25-46``).

    Returns (intrinsics 4x4, pose 4x4) where pose maps camera -> world and
    pose[:3, 3] is the camera center.
    """
    P = np.asarray(P, dtype=np.float64)[:3, :4]
    M = P[:, :3]
    # RQ decomposition of M via QR of the flipped transpose.
    rev = np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], dtype=np.float64)
    Q_, R_ = np.linalg.qr((rev @ M).T)
    K = rev @ R_.T @ rev
    R = rev @ Q_.T
    # Force positive diagonal of K.
    D = np.diag(np.sign(np.diag(K)))
    K = K @ D
    R = D @ R
    if np.linalg.det(R) < 0:  # proper rotation
        R = -R
        K = -K  # keep K @ R = M; sign absorbed by normalization below
    # Camera center: null space of P.
    c = -np.linalg.inv(M) @ P[:, 3]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float64)
    pose[:3, :3] = R.T  # world-from-camera rotation
    pose[:3, 3] = c
    return intrinsics.astype(np.float32), pose.astype(np.float32)


# ---------------------------------------------------------------------------
# jnp-side
# ---------------------------------------------------------------------------

def lift(x, y, z, intrinsics):
    """Back-project pixel coords (x, y) at depth z to homogeneous camera
    coords, honoring skew (ref ``rend_util.py:87-100``).

    x, y, z: (..., N); intrinsics: (..., 4, 4) -> (..., N, 4)
    """
    fx = intrinsics[..., 0, 0][..., None]
    fy = intrinsics[..., 1, 1][..., None]
    cx = intrinsics[..., 0, 2][..., None]
    cy = intrinsics[..., 1, 2][..., None]
    sk = intrinsics[..., 0, 1][..., None]
    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def get_camera_params(uv, pose, intrinsics):
    """Pixel coords -> world-space unit ray directions + camera center.

    uv: (B, P, 2) pixel coords; pose: (B, 4, 4) cam-to-world (or (B, 7)
    quaternion+translation); intrinsics: (B, 4, 4).
    Returns (ray_dirs (B, P, 3), cam_loc (B, 3)).
    Ref ``rend_util.py:48-75`` (+0.5 pixel-center offset included).
    """
    if pose.shape[-1] == 7:
        cam_loc = pose[..., 4:]
        R = quat_to_rot(pose[..., :4])
        p = jnp.zeros(pose.shape[:-1] + (4, 4), pose.dtype)
        p = p.at[..., :3, :3].set(R)
        p = p.at[..., :3, 3].set(cam_loc)
        p = p.at[..., 3, 3].set(1.0)
    else:
        cam_loc = pose[..., :3, 3]
        p = pose

    x = uv[..., 0] + 0.5
    y = uv[..., 1] + 0.5
    z = jnp.ones_like(x)
    pix_cam = lift(x, y, z, intrinsics)  # (B, P, 4)
    world = jnp.einsum("...ij,...pj->...pi", p, pix_cam)[..., :3]
    dirs = world - cam_loc[..., None, :]
    dirs = dirs / jnp.clip(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    return dirs, cam_loc


def get_sphere_intersection(cam_loc, ray_dirs, r=1.0):
    """Intersect rays (origin cam_loc) with the bounding sphere |x| = r.

    cam_loc: (B, 3); ray_dirs: (B, P, 3).
    Returns (t_near_far (B, P, 2) clamped to >= 0, mask_intersect (B, P)).
    Ref ``rend_util.py:141-162``: t = -(d.o) -/+ sqrt((d.o)^2 - |o|^2 + r^2);
    non-intersecting rays get (0, 0).
    """
    d_dot_o = jnp.einsum("bpi,bi->bp", ray_dirs, cam_loc)
    under = d_dot_o ** 2 - (
        jnp.sum(cam_loc ** 2, axis=-1)[..., None] - r ** 2)
    mask = under > 0
    sq = jnp.sqrt(jnp.where(mask, under, 0.0))
    near = jnp.where(mask, -d_dot_o - sq, 0.0)
    far = jnp.where(mask, -d_dot_o + sq, 0.0)
    t = jnp.stack([near, far], axis=-1)
    return jnp.clip(t, 0.0), mask


def quat_to_rot(q):
    """Unit-normalized quaternion (..., 4) [w, x, y, z] -> rotation (..., 3, 3).
    Ref ``rend_util.py:102-119``."""
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ]
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2)


def rot_to_quat(R):
    """Rotation (..., 3, 3) -> quaternion (..., 4) [w, x, y, z].
    Ref ``rend_util.py:121-139`` (assumes trace > -1)."""
    w = jnp.sqrt(jnp.clip(
        1.0 + R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2], 1e-12)) / 2
    x = (R[..., 2, 1] - R[..., 1, 2]) / (4 * w)
    y = (R[..., 0, 2] - R[..., 2, 0]) / (4 * w)
    z = (R[..., 1, 0] - R[..., 0, 1]) / (4 * w)
    return jnp.stack([w, x, y, z], axis=-1)

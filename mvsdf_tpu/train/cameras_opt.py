"""Optional camera-pose optimization: per-image quaternion+translation
embeddings trained jointly with the field.

Behavioral parity target: ``code/training/idr_train.py:121-127`` (7-d pose
vectors in an nn.Embedding initialized from the linear-init cameras, stepped
by SparseAdam) and the quaternion branch of ray generation
(``rend_util.py:48-57``). SparseAdam semantics — only the rows touched by the
batch update their moments and apply steps — are reproduced with masked
moment updates.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

class SparseAdamState(NamedTuple):
    m: jnp.ndarray      # (n, 7)
    v: jnp.ndarray      # (n, 7)
    step: jnp.ndarray   # scalar


def _rot_to_quat_robust(R: np.ndarray) -> np.ndarray:
    """(3, 3) -> (4,) [w, x, y, z], Shepperd's branch selection (the
    reference's naive sqrt(1+trace) formula fails for trace < -1)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def pose_vecs_from_matrices(poses: np.ndarray) -> np.ndarray:
    """(n, 4, 4) cam-to-world -> (n, 7) [quat wxyz, translation]
    (ref get_pose_init, scene_dataset.py:270-287)."""
    q = np.stack([_rot_to_quat_robust(p[:3, :3]) for p in poses])
    return np.concatenate([q, poses[:, :3, 3]], axis=1).astype(np.float32)


def init_sparse_adam(pose_vecs: jnp.ndarray) -> SparseAdamState:
    return SparseAdamState(m=jnp.zeros_like(pose_vecs),
                           v=jnp.zeros_like(pose_vecs),
                           step=jnp.zeros((), jnp.int32))


def sparse_adam_step(state: SparseAdamState, pose_vecs, grads, touched_rows,
                     lr, b1=0.9, b2=0.999, eps=1e-8):
    """grads (n, 7) dense with zeros on untouched rows; touched_rows (n,)
    bool. Only touched rows update moments / apply steps (torch.SparseAdam
    semantics)."""
    t = touched_rows[:, None]
    m = jnp.where(t, b1 * state.m + (1 - b1) * grads, state.m)
    v = jnp.where(t, b2 * state.v + (1 - b2) * grads ** 2, state.v)
    step = state.step + 1
    bc1 = 1 - b1 ** step.astype(jnp.float32)
    bc2 = 1 - b2 ** step.astype(jnp.float32)
    upd = jnp.where(t, -lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps), 0.0)
    return SparseAdamState(m, v, step), pose_vecs + upd

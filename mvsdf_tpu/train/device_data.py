"""Device-resident scene data for the training hot loop.

The reference assembles every batch on the host and copies it to the GPU
each step (ref idr_train.py:258-266 — dataloader + per-field .cuda()).
Round-1 mirrored that (numpy assembly + per-epoch upload), which put the
host and the PCIe/tunnel link on the critical path: the feature maps and
depth maps alone are MBs per step and never change.

TPU-native design: upload every per-image tensor (images, masks, depths,
MVS cams, frozen CNN features, view-selection graph) to HBM ONCE at
trainer start; per step the host ships only two tiny int32 vectors — the
image indices of the batch and the shared pixel subset — and the batch is
gathered in-graph inside the jitted step. Combined with the multi-epoch
``lax.scan`` dispatch (train/step.py make_scan_train_step), the host does
no per-step work at all.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..parallel import sharding as shardlib


def _put(x, mesh):
    arr = jnp.asarray(x)
    if mesh is not None:
        arr = jax.device_put(arr, shardlib.replicated(mesh))
    return arr


class DeviceSceneCache:
    """Scene tensors resident in device memory + in-graph batch gather.

    Mirrors the fields SceneData.get_batch assembles host-side
    (data/scene.py), byte-identical batch contents by construction: the
    same source arrays are indexed with the same indices, just on device.
    """

    def __init__(self, scene, mesh: Optional[jax.sharding.Mesh] = None):
        n = scene.n_images
        self.uv = _put(scene.uv, mesh)                    # (HW, 2)
        self.rgb = _put(scene.rgb, mesh)                  # (N, HW, 3)
        self.masks = _put(scene.masks, mesh)              # (N, HW)
        self.intrinsics = _put(scene.intrinsics, mesh)    # (N, 4, 4)
        self.poses = _put(scene.poses, mesh)              # (N, 4, 4)
        self.depths = _put(scene.depths, mesh)            # (N, 1, h, w)
        self.depth_cams = _put(scene.depth_cams, mesh)    # (N, 2, 4, 4)
        self.size = float(scene.size)
        self.center = _put(scene.center, mesh)            # (3,)
        self.has_feats = scene.feats is not None
        if self.has_feats:
            self.feats = _put(scene.feats, mesh)          # (N, C, h2, w2)
            self.cams_hd = _put(scene.cams_hd, mesh)      # (N, 2, 4, 4)
            self.src_idx = _put(np.asarray(
                [scene.src_indices(i) for i in range(n)], np.int32), mesh)

    def nbytes(self) -> int:
        total = 0
        for v in self.__dict__.values():
            if hasattr(v, "nbytes"):
                total += v.nbytes
        return total

    def gather(self, indices, sel,
               mesh: Optional[jax.sharding.Mesh] = None):
        """In-graph batch assembly: indices (B,) int32 image ids, sel (P,)
        int32 pixel ids -> the batch dict make_step_body consumes. Under a
        mesh the per-ray outputs are constrained to the (None, 'data')
        layout so the gather lands sharded."""
        B = indices.shape[0]
        P = sel.shape[0]
        bi = indices[:, None]
        uv = jnp.broadcast_to(self.uv[sel][None], (B, P, 2))
        object_mask = self.masks[bi, sel[None, :]]
        rgb = self.rgb[bi, sel[None, :]]
        if mesh is not None:
            rs = shardlib.ray_sharded(mesh)
            uv = jax.lax.with_sharding_constraint(uv, rs)
            object_mask = jax.lax.with_sharding_constraint(object_mask, rs)
            rgb = jax.lax.with_sharding_constraint(rgb, rs)
        batch = {
            "indices": indices,
            "uv": uv,
            "intrinsics": self.intrinsics[indices],
            "pose": self.poses[indices],
            "object_mask": object_mask,
            "rgb": rgb,
            # each image contributes its own reference-view depth map
            # (sel_depth_num=1, ref scene_dataset.py:132,203-206)
            "depths": self.depths[indices][:, None],
            "depth_cams": self.depth_cams[indices][:, None],
            "size": jnp.full((B,), self.size, jnp.float32),
            "center": jnp.broadcast_to(self.center[None], (B, 3)),
        }
        if self.has_feats:
            srcs = self.src_idx[indices]               # (B, S)
            batch["feat"] = self.feats[indices]
            batch["feat_src"] = self.feats[srcs]
            batch["cam"] = self.cams_hd[indices]
            batch["src_cams"] = self.cams_hd[srcs]
        return batch

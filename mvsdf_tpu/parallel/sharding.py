"""Sharding specs for the training batch.

Layout contract (see rendering/renderer.py): per-ray arrays are (B, P, ...)
with the per-image ray axis P sharded over the ``data`` mesh axis; everything
per-image (poses, intrinsics, depth maps, feature maps, MVS cams) is small
and replicated. Under this layout every per-ray op is elementwise over its
shard and XLA inserts exactly one gradient/loss all-reduce.
"""
from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

# batch keys carrying a (B, P, ...) per-ray layout -> shard axis 1
_RAY_KEYS = ("uv", "object_mask", "rgb")


def replicated(mesh):
    return NamedSharding(mesh, P())


def ray_sharded(mesh):
    return NamedSharding(mesh, P(None, DATA_AXIS))


def batch_shardings(mesh, batch):
    """Pytree of NamedShardings matching a batch dict."""
    out = {}
    for k, v in batch.items():
        if k in _RAY_KEYS:
            out[k] = ray_sharded(mesh)
        else:
            out[k] = replicated(mesh)
    return out


def device_put_batch(mesh, batch):
    return {k: jax.device_put(v, s)
            for (k, v), s in zip(batch.items(),
                                 batch_shardings(mesh, batch).values())}

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


def validate_ray_divisibility(num_pixels: int, mesh=None):
    """Fail loud on silent remainder drops: the per-image ray axis must
    split evenly over processes (host-sharded loading) and over the mesh's
    data axis (shard layout)."""
    n_proc = jax.process_count()
    if num_pixels % n_proc != 0:
        raise ValueError(
            f"num_pixels={num_pixels} is not divisible by process_count="
            f"{n_proc}: host-sharded loading would silently drop "
            f"{num_pixels % n_proc} rays per image")
    if mesh is not None and num_pixels % mesh.size != 0:
        raise ValueError(
            f"num_pixels={num_pixels} is not divisible by mesh size "
            f"{mesh.size}: the ray axis cannot shard evenly over "
            f"'{DATA_AXIS}'")


def host_ray_slice(num_pixels: int):
    """This host's slice of the per-image ray axis: each host samples and
    feeds only its own rays (host-sharded data loading; the per-epoch pixel
    subset itself is seeded identically on every host)."""
    validate_ray_divisibility(num_pixels)
    n = jax.process_count()
    i = jax.process_index()
    per = num_pixels // n
    return slice(i * per, (i + 1) * per)


def global_batch_from_local(mesh, local_batch):
    """Assemble global sharded arrays from per-process local data: ray keys
    carry this host's ray slice, replicated keys carry identical full
    copies. Single-process: plain device_put."""
    if jax.process_count() == 1:
        return device_put_batch(mesh, local_batch)
    sh = batch_shardings(mesh, local_batch)
    return {k: jax.make_array_from_process_local_data(sh[k], v)
            for k, v in local_batch.items()}

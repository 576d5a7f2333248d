"""Device mesh construction.

The reference is single-process single-GPU (SURVEY.md section 2.14); here the
scale-out model is a 1-D ``data`` mesh axis over all chips (multi-host
included): rays and sample points are sharded over it, MLP parameters are
replicated (they are ~2M params — replication is the idiomatic choice), and
the only cross-chip traffic is the loss/gradient all-reduce that XLA inserts,
riding ICI within a slice and DCN across slices.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> jax.sharding.Mesh:
    """1-D data mesh over the first n devices (default: all)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.sharding.Mesh(devs, (DATA_AXIS,))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """jax.distributed bring-up for multi-host pods. On single-host (or when
    env auto-detection applies, e.g. Cloud TPU metadata) this is a no-op or
    fully automatic."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-host / already initialized
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)

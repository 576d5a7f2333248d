"""NeRF-style positional encoding.

Semantics match the reference embedder (``code/model/embedder.py:5-50``):
output = [x, sin(2^0 x), cos(2^0 x), ..., sin(2^(L-1) x), cos(2^(L-1) x)]
concatenated along the last axis, with log-spaced frequencies 2^0..2^(L-1).
"""
from __future__ import annotations

import jax.numpy as jnp


def embed_dim(multires: int, d_in: int = 3) -> int:
    if multires <= 0:
        return d_in
    return d_in * (1 + 2 * multires)


def positional_encoding(x, multires: int):
    """x (..., d) -> (..., d * (1 + 2*multires)). Identity if multires <= 0."""
    if multires <= 0:
        return x
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)  # 2^0 .. 2^(L-1)
    parts = [x]
    for i in range(multires):
        xf = x * freqs[i]
        parts.append(jnp.sin(xf))
        parts.append(jnp.cos(xf))
    return jnp.concatenate(parts, axis=-1)

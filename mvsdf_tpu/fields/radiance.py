"""Surface light-field MLP: (point, normal, view dir, feature) -> RGB.

Semantics follow the reference RenderingNetwork
(``code/model/implicit_differentiable_renderer.py:109-167``): input concat
[point, PE(view_dir), normal, feature] in mode 'idr', 4 hidden layers of 512
with ReLU, tanh output in [-1, 1], weight norm, torch-default linear init.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .embedder import positional_encoding, embed_dim
from .mlp import (make_wn_linear, make_plain_linear, linear_apply,
                  torch_linear_default_init)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    feature_vector_size: int = 256
    mode: str = "idr"  # 'idr' | 'no_view_dir' | 'no_normal'
    d_in: int = 9
    d_out: int = 3
    dims: Tuple[int, ...] = (512,) * 4
    weight_norm: bool = True
    multires_view: int = 4

    @property
    def layer_dims(self) -> Tuple[int, ...]:
        d0 = self.d_in + self.feature_vector_size
        if self.multires_view > 0:
            d0 += embed_dim(self.multires_view, 3) - 3
        return (d0,) + tuple(self.dims) + (self.d_out,)


def init_render(cfg: RenderConfig, rng: np.random.Generator):
    dims = cfg.layer_dims
    params = []
    for l in range(len(dims) - 1):
        W, b = torch_linear_default_init(rng, dims[l], dims[l + 1])
        params.append(make_wn_linear(W, b) if cfg.weight_norm
                      else make_plain_linear(W, b))
    return params


def render_apply(cfg: RenderConfig, params, points, normals, view_dirs,
                 features):
    """All inputs (..., d); returns RGB (..., 3) in [-1, 1]."""
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)
    if cfg.mode == "idr":
        h = jnp.concatenate([points, view_dirs, normals, features], axis=-1)
    elif cfg.mode == "no_view_dir":
        h = jnp.concatenate([points, normals, features], axis=-1)
    elif cfg.mode == "no_normal":
        h = jnp.concatenate([points, view_dirs, features], axis=-1)
    else:
        raise ValueError(f"unknown mode {cfg.mode}")
    n_layers = len(cfg.layer_dims)
    for l in range(n_layers - 1):
        h = linear_apply(params[l], h)
        if l < n_layers - 2:
            h = jnp.maximum(h, 0.0)
    return jnp.tanh(h)

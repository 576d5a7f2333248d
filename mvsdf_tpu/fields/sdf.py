"""Implicit geometry field: coordinate MLP mapping a 3D point to
(SDF value, surface-indicator logit, feature vector).

Architecture + geometric initialization semantics follow the reference
ImplicitNetwork (``code/model/implicit_differentiable_renderer.py:19-107``):
9 weight-normalized linear layers 39 -> 512x8 -> 258 with a skip connection
re-concatenating the embedded input at layer 4 (scaled 1/sqrt(2)),
Softplus(beta=100) activations, and an init that makes the SDF approximate a
sphere of radius ``bias``.

The spatial gradient is computed with one reverse-mode pass
(``jax.vjp``), which is itself differentiable — this replaces the
reference's ``torch.autograd.grad(create_graph=True)`` double-backprop
(``implicit_differentiable_renderer.py:96-107``) with an XLA-fusable graph.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .embedder import positional_encoding, embed_dim
from .mlp import make_wn_linear, make_plain_linear, linear_apply


@dataclasses.dataclass(frozen=True)
class ImplicitConfig:
    feature_vector_size: int = 256
    d_in: int = 3
    d_out: int = 1
    dims: Tuple[int, ...] = (512,) * 8
    geometric_init: bool = True
    bias: float = 0.6
    skip_in: Tuple[int, ...] = (4,)
    weight_norm: bool = True
    multires: int = 6
    # Store hidden activations in bf16 (matmuls still accumulate f32 via
    # preferred_element_type — identical multiplication precision to the
    # DEFAULT-precision f32 path). Halves the HBM bytes of the supervised
    # forward/backward, which profiling shows is bandwidth-bound, not
    # FLOP-bound. Off by default (golden parity tests pin the f32 path);
    # quality-validated before any pipeline turns it on (PERF.md).
    bf16_activations: bool = False
    # Hand-derived custom VJP for value+spatial-gradient (fused_grad.py):
    # the gradient-output cotangent is computed via the mixed-derivative
    # (jvp) identity with stacked cotangent matmuls and z-only residuals,
    # instead of letting JAX transpose the vjp pullback. Same math
    # (golden-parity-tested) but measured 5% SLOWER than XLA's autodiff
    # transpose on v5e (bench A/B 404.6k vs 384.6k rays/s — the stacked
    # matmuls defeat fusion XLA already does), so OFF by default; kept as
    # a validated option and a reference derivation.
    fused_value_grad: bool = False

    @property
    def layer_dims(self) -> Tuple[int, ...]:
        d0 = embed_dim(self.multires, self.d_in)
        return (d0,) + tuple(self.dims) + (
            self.d_out + 1 + self.feature_vector_size,)


def init_implicit(cfg: ImplicitConfig, rng: np.random.Generator):
    """Geometric init to an approximate sphere of radius cfg.bias
    (ref ``implicit_differentiable_renderer.py:45-73``)."""
    dims = cfg.layer_dims
    n_layers = len(dims)
    params = []
    for l in range(n_layers - 1):
        if (l + 1) in cfg.skip_in:
            out_dim = dims[l + 1] - dims[0]
        else:
            out_dim = dims[l + 1]
        in_dim = dims[l]
        if cfg.geometric_init:
            if l == n_layers - 2:
                W = rng.normal(np.sqrt(np.pi) / np.sqrt(in_dim), 1e-4,
                               size=(out_dim, in_dim))
                b = np.full((out_dim,), -cfg.bias)
            elif cfg.multires > 0 and l == 0:
                W = np.zeros((out_dim, in_dim))
                W[:, :3] = rng.normal(0.0, np.sqrt(2) / np.sqrt(out_dim),
                                      size=(out_dim, 3))
                b = np.zeros((out_dim,))
            elif cfg.multires > 0 and l in cfg.skip_in:
                W = rng.normal(0.0, np.sqrt(2) / np.sqrt(out_dim),
                               size=(out_dim, in_dim))
                W[:, -(dims[0] - 3):] = 0.0  # zero high-freq PE of the skip
                b = np.zeros((out_dim,))
            else:
                W = rng.normal(0.0, np.sqrt(2) / np.sqrt(out_dim),
                               size=(out_dim, in_dim))
                b = np.zeros((out_dim,))
        else:
            bound = 1.0 / np.sqrt(in_dim)
            W = rng.uniform(-bound, bound, size=(out_dim, in_dim))
            b = rng.uniform(-bound, bound, size=(out_dim,))
        params.append(make_wn_linear(W, b) if cfg.weight_norm
                      else make_plain_linear(W, b))
    return params


def _softplus100(x):
    # Softplus(beta=100): log(1 + exp(100 x)) / 100, numerically stable.
    return jnp.logaddexp(0.0, 100.0 * x) * 0.01


def implicit_apply(cfg: ImplicitConfig, params, x):
    """x (..., 3) -> (..., 1 + 1 + feature_vector_size):
    [sdf, surface-indicator logit, feature]."""
    inp = positional_encoding(x, cfg.multires)
    if cfg.bf16_activations:
        inp = inp.astype(jnp.bfloat16)
    h = inp
    n_layers = len(cfg.layer_dims)
    for l in range(n_layers - 1):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inp], axis=-1) / np.sqrt(2)
            if cfg.bf16_activations:
                h = h.astype(jnp.bfloat16)
        h = linear_apply(params[l], h)
        if l < n_layers - 2:
            # softplus in f32 (linear_apply accumulates f32), then the
            # storage cast
            h = _softplus100(h)
            if cfg.bf16_activations:
                h = h.astype(jnp.bfloat16)
    return h


def sdf_apply(cfg: ImplicitConfig, params, x):
    """x (..., 3) -> sdf (...,)."""
    return implicit_apply(cfg, params, x)[..., 0]


def sdf_grad(cfg: ImplicitConfig, params, x):
    """Spatial SDF gradient at x (..., 3) -> (..., 3); differentiable w.r.t.
    params (one extra reverse pass, no double-backprop graph)."""
    _, pullback = jax.vjp(lambda p: sdf_apply(cfg, params, p), x)
    (g,) = pullback(jnp.ones(x.shape[:-1], x.dtype))
    return g


def sdf_value_and_grad(cfg: ImplicitConfig, params, x):
    """Returns (sdf (...,), grad (..., 3)) in one linearization."""
    y, pullback = jax.vjp(lambda p: sdf_apply(cfg, params, p), x)
    (g,) = pullback(jnp.ones(x.shape[:-1], x.dtype))
    return y, g


def full_value_and_grad(cfg: ImplicitConfig, params, x):
    """Returns (full output (..., 2+F), sdf grad (..., 3)) sharing ONE
    forward pass between the value and the spatial gradient — the hot
    supervised-path combination. With cfg.fused_value_grad the whole
    value+grad (and its parameter backward) runs through the hand-derived
    custom VJP in fused_grad.py; otherwise jax.vjp + autodiff transpose."""
    if cfg.fused_value_grad:
        from .fused_grad import fused_full_value_and_grad
        return fused_full_value_and_grad(cfg, params, x)
    out, pullback = jax.vjp(lambda p: implicit_apply(cfg, params, p), x)
    ct = jnp.zeros_like(out).at[..., 0].set(1.0)
    (g,) = pullback(ct)
    return out, g

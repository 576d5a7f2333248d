"""Weight-normalized linear layers as explicit parameter pytrees.

Weight normalization follows torch's ``nn.utils.weight_norm`` semantics
(dim=0): the effective weight of a layer with output rows w_o is
``W_eff[o] = g[o] * V[o] / ||V[o]||`` where the norm is over the input axis.
At init, ``g = ||W_init[o]||`` and ``V = W_init``, so the initial effective
weight equals the raw init — this matches how the reference wraps its
geometric init (``implicit_differentiable_renderer.py:53-71``).

We store V transposed as (d_in, d_out) so the forward pass is a plain
``x @ W`` feeding the MXU.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def make_wn_linear(W, b):
    """Build weight-norm params from a raw init weight W (d_out, d_in) and
    bias b (d_out,). Returns dict(v=(d_in, d_out), g=(d_out,), b=(d_out,))."""
    W = np.asarray(W, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    g = np.linalg.norm(W, axis=1)  # per-output-row norm
    return {"v": jnp.asarray(W.T), "g": jnp.asarray(g), "b": jnp.asarray(b)}


def make_plain_linear(W, b):
    """Non-weight-norm layer: dict(w=(d_in, d_out), b=(d_out,))."""
    return {"w": jnp.asarray(np.asarray(W, np.float32).T),
            "b": jnp.asarray(np.asarray(b, np.float32))}


def effective_weight(layer):
    """(d_in, d_out) effective weight of a layer param dict."""
    if "v" in layer:
        norm = jnp.linalg.norm(layer["v"], axis=0, keepdims=True)  # (1, d_out)
        return layer["v"] * (layer["g"][None, :] / jnp.clip(norm, 1e-12))
    return layer["w"]


def linear_apply(layer, x):
    """x (..., d_in) -> (..., d_out). A bf16 input selects the
    half-traffic path: the weight is cast to bf16 and the dot accumulates
    in f32 (`preferred_element_type`) — the same multiplication precision
    as an f32 matmul under DEFAULT precision, but activations, backward
    residuals, and their cotangent chains move half the HBM bytes."""
    W = effective_weight(layer)
    if x.dtype == jnp.bfloat16:
        y = jax.lax.dot_general(
            x, W.astype(jnp.bfloat16),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y + layer["b"]
    return x @ W + layer["b"]


def torch_linear_default_init(rng: np.random.Generator, d_in, d_out):
    """torch nn.Linear default init: W, b ~ U(-1/sqrt(d_in), 1/sqrt(d_in)).
    (kaiming_uniform(a=sqrt(5)) reduces to this bound.) Returns (W, b) with
    W shaped (d_out, d_in)."""
    bound = 1.0 / np.sqrt(d_in)
    W = rng.uniform(-bound, bound, size=(d_out, d_in))
    b = rng.uniform(-bound, bound, size=(d_out,))
    return W, b

"""Pallas TPU kernel: fused SDF-MLP evaluation with all weights resident in
VMEM.

The sphere-trace march (ref ``code/model/ray_tracing.py``) evaluates the
9-layer 512-wide geometry MLP dozens of times per ray. Under plain XLA every
layer writes its (N, 512) activation to HBM; this kernel keeps the whole
weight set (~7.6 MB f32 for the full-size net — comfortably inside the
~16 MB VMEM) and the running activation block on-chip, so each evaluation
reads only the positionally-encoded points and writes only the SDF values.

Layout tricks (all shapes padded to the (8/16, 128) TPU tile grid):
  - the positional encoding (39 lanes for multires=6) is computed outside
    the kernel (XLA fuses it) and zero-padded to 128 lanes;
  - the skip concatenation ``cat(h, pe)/sqrt(2) @ W`` is rewritten as
    ``(h @ W_h + pe @ W_pe) / sqrt(2)`` — no in-kernel concat;
  - layers whose true width is narrower than the padded width (the pre-skip
    layer: 473 of 512) zero-pad both the bias and the consuming weight's
    rows, so the softplus(0 + 0) = log(2)/100 garbage lanes are annihilated
    by the zero rows of the next matmul;
  - only the SDF column of the final layer ships (tracing never needs the
    indicator/feature outputs), broadcast into a 128-lane output block.

Weight-norm reparameterization is folded into effective weights once per
training step (``pack_sdf_weights``); the kernel sees plain matrices.
"""
from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from ...fields.embedder import positional_encoding, embed_dim
from ...fields.mlp import effective_weight
from ...fields.sdf import ImplicitConfig


def _round_up(x, m):
    return -(-x // m) * m


def pack_sdf_weights(cfg: ImplicitConfig, params, dtype=jnp.float32):
    """Fold weight norm and pad all layers to 128-lane tiles.

    Returns dict:
      w_in (Dpe_pad, H), b list[(1, H)], w_hid list[(H, H)],
      w_skip_h (H, H), w_skip_pe (Dpe_pad, H) (when a skip exists),
      w_out (H, 128), b_out (1, 128)
    """
    dims = cfg.layer_dims
    n_layers = len(dims)
    d_pe = dims[0]
    d_pe_pad = _round_up(d_pe, 128)
    H = _round_up(max(dims[1:-1]), 128)
    assert all(d <= H for d in dims[1:-1])
    skips = set(cfg.skip_in)

    packed = {"layers": []}
    for l in range(n_layers - 1):
        W = effective_weight(params[l])  # (in, out)
        b = params[l]["b"]
        in_dim, out_dim = W.shape
        last = l == n_layers - 2
        if l == 0:
            Wp = jnp.zeros((d_pe_pad, H), dtype).at[:in_dim, :out_dim].set(
                W.astype(dtype))
            bp = jnp.zeros((1, H), dtype).at[0, :out_dim].set(b.astype(dtype))
            packed["layers"].append(("in", Wp, bp))
        elif l in skips:
            # input = cat(h_prev (in_dim - d_pe), pe (d_pe)) / sqrt(2)
            h_dim = in_dim - d_pe
            Wh = jnp.zeros((H, H), dtype).at[:h_dim, :out_dim].set(
                W[:h_dim].astype(dtype))
            Wpe = jnp.zeros((d_pe_pad, H), dtype).at[:d_pe, :out_dim].set(
                W[h_dim:].astype(dtype))
            bp = jnp.zeros((1, H), dtype).at[0, :out_dim].set(b.astype(dtype))
            packed["layers"].append(("skip", Wh, Wpe, bp))
        elif last:
            # SDF column only, broadcast to a 128-lane block
            Wp = jnp.zeros((H, 128), dtype).at[:in_dim, 0].set(
                W[:, 0].astype(dtype))
            bp = jnp.zeros((1, 128), dtype).at[0, 0].set(
                b[0].astype(dtype))
            packed["layers"].append(("out", Wp, bp))
        else:
            Wp = jnp.zeros((H, H), dtype).at[:in_dim, :out_dim].set(
                W.astype(dtype))
            bp = jnp.zeros((1, H), dtype).at[0, :out_dim].set(b.astype(dtype))
            packed["layers"].append(("hid", Wp, bp))
    packed["d_pe"] = d_pe
    packed["d_pe_pad"] = d_pe_pad
    packed["H"] = H
    return packed


def _softplus100(x):
    return jnp.logaddexp(0.0, 100.0 * x) * 0.01


def _make_kernel(layer_kinds, n_weight_args):
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    # Explicit DEFAULT precision: Mosaic rejects the session-wide
    # tensorfloat32/HIGH setting, and f32 dots are exact here anyway.
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)

    def kernel(pe_ref, *refs):
        w_refs = refs[:-1]
        out_ref = refs[-1]
        pe = pe_ref[:]
        h = None
        wi = 0
        for kind in layer_kinds:
            if kind == "in":
                W, b = w_refs[wi][:], w_refs[wi + 1][:]
                wi += 2
                h = _softplus100(dot(pe, W) + b)
            elif kind == "hid":
                W, b = w_refs[wi][:], w_refs[wi + 1][:]
                wi += 2
                h = _softplus100(dot(h, W) + b)
            elif kind == "skip":
                Wh, Wpe, b = (w_refs[wi][:], w_refs[wi + 1][:],
                              w_refs[wi + 2][:])
                wi += 3
                z = (dot(h, Wh) + dot(pe, Wpe)) * inv_sqrt2
                h = _softplus100(z + b)
            else:  # out
                W, b = w_refs[wi][:], w_refs[wi + 1][:]
                wi += 2
                out_ref[:] = dot(h, W) + b
        assert wi == n_weight_args

    return kernel


def _make_pe_kernel(layer_kinds, n_weight_args):
    """Variant computing the positional encoding INSIDE the kernel from raw
    (block, 8) xyz blocks: z = x8 @ M scatters frequency-scaled copies of
    (x, y, z) across PE lanes, then constant id/sin/cos lane masks select
    the transform (same machinery as the fused march kernel). Cuts the
    kernel's HBM input stream from d_pe_pad (128) lanes to 8 per point."""
    body = _make_kernel(layer_kinds, n_weight_args)

    def kernel(x_ref, M_ref, mid_ref, msin_ref, mcos_ref, *refs):
        z = jnp.dot(x_ref[:], M_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
        pe = (mid_ref[:] * z + msin_ref[:] * jnp.sin(z) +
              mcos_ref[:] * jnp.cos(z))

        class _Box:  # minimal ref-like wrapper over the computed PE block
            def __getitem__(self, idx):
                return pe

        body(_Box(), *refs)

    return kernel


def pallas_sdf_apply(cfg: ImplicitConfig, packed, x, block: int = 1024,
                     interpret: bool = False, in_kernel_pe: bool = False):
    """SDF at x (..., 3) -> (...) via the fused kernel. ``packed`` is a
    traced pytree from pack_sdf_weights — safe to call inside a larger jit
    (e.g. the training step, re-packing effective weights each step)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d_pe = packed["d_pe"]
    d_pe_pad = packed["d_pe_pad"]

    weight_args = []
    layer_kinds = []
    for entry in packed["layers"]:
        layer_kinds.append(entry[0])
        weight_args.extend(entry[1:])

    lead = x.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    xf = x.reshape(n, 3)
    n_pad = _round_up(max(n, block), block)

    if in_kernel_pe:
        from .march_kernel import pe_constants
        kernel = _make_pe_kernel(layer_kinds, len(weight_args))
        M, m_id, m_sin, m_cos = pe_constants(cfg, d_pe_pad)
        x8 = jnp.pad(xf, ((0, n_pad - n), (0, 5)))
        lead_args = (x8, M, m_id, m_sin, m_cos)
        in_specs = [pl.BlockSpec((block, 8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        in_specs += [pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
                     for a in (M, m_id, m_sin, m_cos)]
    else:
        kernel = _make_kernel(layer_kinds, len(weight_args))
        pe = positional_encoding(xf, cfg.multires)
        pe = jnp.pad(pe, ((0, n_pad - n), (0, d_pe_pad - d_pe)))
        lead_args = (pe,)
        in_specs = [pl.BlockSpec((block, d_pe_pad), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]

    for w in weight_args:
        in_specs.append(pl.BlockSpec(
            w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
            memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        interpret=interpret,
    )(*lead_args, *weight_args)
    return out[:n, 0].reshape(lead)


def make_pallas_sdf_fn(cfg: ImplicitConfig, packed, block: int = 1024,
                       interpret: bool = False, in_kernel_pe: bool = False):
    """Convenience closure: sdf_fn(x) with packed weights captured."""
    @jax.jit
    def sdf_fn(x):
        return pallas_sdf_apply(cfg, packed, x, block=block,
                                interpret=interpret,
                                in_kernel_pe=in_kernel_pe)

    return sdf_fn

"""Fused bracketed-secant kernel: all n_secant_steps iterations in ONE
pallas_call.

The XLA-driven secant (ref ``code/model/ray_tracing.py:260-278``; our
``tracing/sphere_trace._secant``) launches one SDF-MLP evaluation per
iteration — 8 small sequential kernels per training step. Here the bracket
state lives in VMEM scratch and the MLP (weights VMEM-resident, in-kernel
positional encoding via the constant scatter matmul) runs inside a
``fori_loop``, so the whole refinement is a single launch per ray block.

Iteration math matches ``_secant`` exactly: guarded secant proposal,
positive/negative bracket updates, final proposal after the fixed trip
count.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ...fields.sdf import ImplicitConfig
from .sdf_kernel import _round_up
from .march_kernel import pe_constants, _mlp_body


def _make_secant_kernel(layer_kinds, n_weights, n_steps):
    from jax.experimental import pallas as pl

    def z_of(sl, sh, zl, zh):
        denom = sh - sl
        denom = jnp.where(jnp.abs(denom) < 1e-12,
                          jnp.where(denom < 0, -1e-12, 1e-12), denom)
        return -sl * (zh - zl) / denom + zl

    def kernel(ray_ref, st_ref, M_ref, mid_ref, msin_ref, mcos_ref, *refs):
        w_refs = refs[:n_weights]
        out_ref = refs[n_weights]
        s_ref = refs[n_weights + 1]    # (Np, 8) scratch:
        # cols 0..4 = z_low, z_high, sdf_low, sdf_high, z_pred

        org = ray_ref[:, 0:3]
        dirs = ray_ref[:, 3:6]
        M = M_ref[:]
        m_id = mid_ref[:]
        m_sin = msin_ref[:]
        m_cos = mcos_ref[:]

        zl = st_ref[:, 0:1]
        zh = st_ref[:, 1:2]
        sl = st_ref[:, 2:3]
        sh = st_ref[:, 3:4]
        init = jnp.concatenate(
            [zl, zh, sl, sh, z_of(sl, sh, zl, zh),
             jnp.zeros_like(zl), jnp.zeros_like(zl), jnp.zeros_like(zl)],
            axis=1)
        s_ref[:] = init

        def body(_i, __):
            zl = s_ref[:, 0:1]
            zh = s_ref[:, 1:2]
            sl = s_ref[:, 2:3]
            sh = s_ref[:, 3:4]
            zp = s_ref[:, 4:5]
            p = org + zp * dirs
            p8 = jnp.pad(p, ((0, 0), (0, 5)))
            z = jnp.dot(p8, M, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            pe = m_id * z + m_sin * jnp.sin(z) + m_cos * jnp.cos(z)
            sdf_mid = _mlp_body(layer_kinds, w_refs, pe)[:, 0:1]
            pos = sdf_mid > 0
            neg = sdf_mid < 0
            zl = jnp.where(pos, zp, zl)
            sl = jnp.where(pos, sdf_mid, sl)
            zh = jnp.where(neg, zp, zh)
            sh = jnp.where(neg, sdf_mid, sh)
            zp = z_of(sl, sh, zl, zh)
            s_ref[:] = jnp.concatenate(
                [zl, zh, sl, sh, zp, jnp.zeros_like(zl),
                 jnp.zeros_like(zl), jnp.zeros_like(zl)], axis=1)
            return 0

        jax.lax.fori_loop(0, n_steps, body, 0)
        out_ref[:, 0:1] = s_ref[:, 4:5]
        out_ref[:, 1:4] = jnp.zeros_like(out_ref[:, 1:4])

    return kernel


def pallas_secant(cfg, icfg: ImplicitConfig, packed, org, dirs, z_low,
                  z_high, sdf_low, sdf_high, block: int = 1024,
                  interpret: bool = False):
    """Drop-in replacement for tracing.sphere_trace._secant backed by the
    fused kernel. cfg: TracerConfig. All per-ray arrays (L...)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lead = z_low.shape
    n = int(np.prod(lead)) if lead else 1

    weight_args = []
    layer_kinds = []
    for entry in packed["layers"]:
        layer_kinds.append(entry[0])
        weight_args.extend(entry[1:])

    d_pe_pad = packed["d_pe_pad"]
    M, m_id, m_sin, m_cos = pe_constants(icfg, d_pe_pad)
    kernel = _make_secant_kernel(layer_kinds, len(weight_args),
                                 cfg.n_secant_steps)

    n_pad = _round_up(max(n, block), block)
    ray = jnp.zeros((n_pad, 8), jnp.float32)
    ray = ray.at[:n, 0:3].set(org.reshape(n, 3))
    ray = ray.at[:n, 3:6].set(dirs.reshape(n, 3))
    st = jnp.zeros((n_pad, 4), jnp.float32)
    st = st.at[:n, 0].set(z_low.reshape(n))
    st = st.at[:n, 1].set(z_high.reshape(n))
    st = st.at[:n, 2].set(sdf_low.reshape(n))
    st = st.at[:n, 3].set(sdf_high.reshape(n))

    in_specs = [
        pl.BlockSpec((block, 8), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 4), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(M.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(m_id.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(m_sin.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(m_cos.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    for w in weight_args:
        in_specs.append(pl.BlockSpec(
            w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
            memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, 8), jnp.float32)],
        interpret=interpret,
    )(ray, st, M, m_id, m_sin, m_cos, *weight_args)
    return out[:n, 0].reshape(lead)

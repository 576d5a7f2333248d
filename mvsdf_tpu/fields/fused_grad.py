"""Fused value+spatial-gradient of the implicit MLP with a hand-derived
custom VJP — the supervised hot path.

``full_value_and_grad`` (fields/sdf.py) computes (out, g=grad_x sdf) with
``jax.vjp`` and lets JAX differentiate through the pullback when the loss is
differentiated w.r.t. parameters — the reference pays the same structure as
``torch.autograd.grad(create_graph=True)`` double-backprop
(``code/model/implicit_differentiable_renderer.py:96-107``). That generic
transpose materializes a second set of per-layer residuals and runs four
narrow matmuls per layer in the backward.

This module derives the backward by hand from the mixed-derivative identity

    d/dp  <gbar, grad_x f>  =  d/dp  jvp(f; x, gbar)

(equality of second partials), so the gradient-output cotangent is handled
by ONE forward tangent pass plus a combined reverse pass in which the
primal-chain and tangent-chain cotangent matmuls are STACKED along the
point axis (half the matmul launches, double the M dimension for the MXU),
and the only stored residuals are the per-layer pre-activations z_l —
everything else (activations, PE) is recomputed elementwise on the fly.

Exactness: same math as the autodiff path up to float reassociation; the
golden parity tests (tests/golden/test_e2e_vs_reference.py,
test_e2e_fullsize_vs_reference.py) pin it against the torch reference.

Activation function softplus(beta=100) (ref :75):
    sigma(z)   = logaddexp(0, 100 z) / 100
    sigma'(z)  = sigmoid(100 z)
    sigma''(z) = 100 sigmoid(100 z) (1 - sigmoid(100 z))
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .mlp import effective_weight


def _sigma(z):
    return jnp.logaddexp(0.0, 100.0 * z) * 0.01


def _sigma_p(z):
    return jax.nn.sigmoid(100.0 * z)


def _sigma_pp(z):
    s = jax.nn.sigmoid(100.0 * z)
    return 100.0 * s * (1.0 - s)


def _pe(x, multires):
    """Positional encoding + its elementwise first/second derivative
    factors. Returns (pe (N, D), dpe (N, D), d2pe (N, D), coord (D,) int32
    mapping each PE channel to its source coordinate)."""
    N, d = x.shape
    if multires <= 0:
        eye = jnp.ones((N, d), x.dtype)
        return x, eye, jnp.zeros((N, d), x.dtype), np.arange(d)
    parts, dparts, d2parts, coords = [x], [jnp.ones_like(x)], [
        jnp.zeros_like(x)], [np.arange(d)]
    for i in range(multires):
        f = 2.0 ** i
        xf = x * f
        s, c = jnp.sin(xf), jnp.cos(xf)
        parts += [s, c]
        dparts += [f * c, -f * s]
        d2parts += [-f * f * s, -f * f * c]
        coords += [np.arange(d), np.arange(d)]
    return (jnp.concatenate(parts, -1), jnp.concatenate(dparts, -1),
            jnp.concatenate(d2parts, -1), np.concatenate(coords))


def _mm(a, w, bf16):
    """a (N, in) @ w (in, out), optionally moving bf16 bytes with f32
    accumulation (same semantics as mlp.linear_apply)."""
    if bf16:
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return a @ w


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fvg(multires, skip_in, bf16, Ws, bs, x):
    out, g, _ = _fvg_fwd_impl(multires, skip_in, bf16, Ws, bs, x)
    return out, g


def _fvg_fwd_impl(multires, skip_in, bf16, Ws, bs, x):
    L = len(Ws)
    inp, dpe, _, coord = _pe(x, multires)
    isqrt2 = 1.0 / np.sqrt(2.0)

    # ---- forward, storing pre-activations z only -------------------------
    zs = []
    h = inp
    for l in range(L):
        ht = jnp.concatenate([h, inp], -1) * isqrt2 if l in skip_in else h
        z = _mm(ht, Ws[l], bf16) + bs[l]
        zs.append(z)
        h = _sigma(z) if l < L - 1 else z
    out = h

    # ---- spatial gradient: one reverse pass, cotangent seeded on the SDF
    # channel (out[..., 0]) ------------------------------------------------
    d0 = inp.shape[-1]
    zb = jnp.zeros_like(out).at[..., 0].set(1.0)
    inpbar = jnp.zeros_like(inp)
    for l in range(L - 1, -1, -1):
        hb = _mm(zb, Ws[l].T, bf16)
        if l in skip_in:
            inpbar = inpbar + hb[..., -d0:] * isqrt2
            hb = hb[..., :-d0] * isqrt2
        if l > 0:
            zb = hb * _sigma_p(zs[l - 1])
        else:
            inpbar = inpbar + hb
    # pull back through the PE (channel blocks are d-wide: [x, sin, cos...])
    g = _pe_pullback(inpbar * dpe, x.shape[-1])
    return out, g, tuple(zs)


def _pe_pullback(weighted, d):
    """(N, K*d) -> (N, d): sum the d-wide PE blocks."""
    N, D = weighted.shape
    return weighted.reshape(N, D // d, d).sum(1)


def _fvg_fwd(multires, skip_in, bf16, Ws, bs, x):
    out, g, zs = _fvg_fwd_impl(multires, skip_in, bf16, Ws, bs, x)
    return (out, g), (Ws, bs, x, zs)


def _fvg_bwd(multires, skip_in, bf16, res, cts):
    Ws, bs, x, zs = res
    outbar, gbar = cts
    L = len(Ws)
    inp, dpe, d2pe, coord = _pe(x, multires)
    d0 = inp.shape[-1]
    isqrt2 = 1.0 / np.sqrt(2.0)

    # ---- tangent pass in direction gbar (the jvp identity):
    # <gbar, grad_x f> = d/deps f(x + eps*gbar) -----------------------------
    t_inp = dpe * gbar[..., coord]          # tangent of the PE
    zetas = []
    u = t_inp
    for l in range(L):
        ut = jnp.concatenate([u, t_inp], -1) * isqrt2 \
            if l in skip_in else u
        zeta = _mm(ut, Ws[l], bf16)
        zetas.append(zeta)
        u = _sigma_p(zs[l]) * zeta if l < L - 1 else zeta

    # ---- combined reverse pass: primal-chain cotangent zb (seeded with
    # outbar) and tangent-chain cotangent tb (seeded e_sdf, the coefficient
    # of <gbar, g> in the loss), stacked into one matmul per step ----------
    zb = outbar
    tb = jnp.zeros_like(outbar).at[..., 0].set(1.0)
    inpbar = jnp.zeros_like(inp)
    tinpbar = jnp.zeros_like(t_inp)
    Wbars = [None] * L
    bbars = [None] * L
    for l in range(L - 1, -1, -1):
        # reconstruct this layer's inputs from the stored pre-activations
        if l == 0:
            h_in, u_in = inp, t_inp
        else:
            h_in = _sigma(zs[l - 1])
            u_in = _sigma_p(zs[l - 1]) * zetas[l - 1]
        if l in skip_in:
            h_in = jnp.concatenate([h_in, inp], -1) * isqrt2
            u_in = jnp.concatenate([u_in, t_inp], -1) * isqrt2
        stacked_ct = jnp.concatenate([zb, tb], 0)          # (2N, out)
        stacked_in = jnp.concatenate([h_in, u_in], 0)      # (2N, in)
        Wbars[l] = _mm(stacked_in.T, stacked_ct, bf16)     # (in, out)
        bbars[l] = jnp.sum(zb, 0)
        back = _mm(stacked_ct, Ws[l].T, bf16)              # (2N, in)
        hb, ub = jnp.split(back, 2, axis=0)
        if l in skip_in:
            inpbar = inpbar + hb[..., -d0:] * isqrt2
            tinpbar = tinpbar + ub[..., -d0:] * isqrt2
            hb = hb[..., :-d0] * isqrt2
            ub = ub[..., :-d0] * isqrt2
        if l > 0:
            sp = _sigma_p(zs[l - 1])
            spp = _sigma_pp(zs[l - 1])
            zb = hb * sp + ub * zetas[l - 1] * spp
            tb = ub * sp
        else:
            inpbar = inpbar + hb
            tinpbar = tinpbar + ub

    # ---- input cotangent through the PE ----------------------------------
    # x_bar = J_PE^T inpbar  +  d/dx [J_PE(x) gbar]^T tinpbar
    xbar = _pe_pullback(inpbar * dpe + tinpbar * d2pe * gbar[..., coord],
                        x.shape[-1])
    return tuple(Wbars), tuple(bbars), xbar


_fvg.defvjp(_fvg_fwd, _fvg_bwd)


def fused_full_value_and_grad(cfg, params, x):
    """Drop-in for fields.sdf.full_value_and_grad: x (..., d_in) ->
    (out (..., 2+F), grad (..., d_in)). The weight-norm reparameterization
    stays outside the custom VJP (O(params) work JAX differentiates
    normally); the O(points) MLP passes use the fused custom VJP above."""
    Ws = tuple(effective_weight(p) for p in params)
    bs = tuple(p["b"] for p in params)
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    out, g = _fvg(cfg.multires, tuple(cfg.skip_in), cfg.bf16_activations,
                  Ws, bs, xf)
    return out.reshape(lead + (out.shape[-1],)), g.reshape(lead + (
        x.shape[-1],))

"""Implicit-function differentiation of the ray-SDF intersection.

Makes the traced intersection point differentiable w.r.t. network parameters
without unrolling the march (ref SampleNetwork, ``code/model/sample_network.py
:10-20``; IDR paper eq. 3):

    t(theta) = t0 - (f_theta(x0) - sg[f_theta0(x0)]) / sg[grad f . v]
    x(theta) = c + t(theta) * v

where sg[.] is stop_gradient, t0 the frozen traced distance, x0 = c + t0 v.
At the current parameters t(theta) == t0 exactly; the derivative w.r.t.
theta is the implicit-function gradient.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def differentiable_surface_points(sdf_vals, sdf_vals_detached, grads_detached,
                                  dists, cam_loc, ray_dirs, valid_mask=None,
                                  min_dot: float = 0.0):
    """All inputs per-ray with any leading shape, (L...,) / (L..., 3).

    sdf_vals: SDF at the traced points, *with* live parameter gradients.
    sdf_vals_detached / grads_detached: stop-gradient values at the same
    points. dists/cam_loc/ray_dirs come from the non-differentiable trace.
    valid_mask guards the division on lanes that did not hit a surface
    (the reference indexes hits only; we keep every lane and mask).
    min_dot > 0 clamps |grad . dir| away from zero (grazing rays otherwise
    get unbounded gradients; 0 = reference-exact).
    """
    dirs0 = jax.lax.stop_gradient(ray_dirs)
    dot = jnp.sum(grads_detached * dirs0, axis=-1)
    if min_dot > 0.0:
        dot = jnp.where(jnp.abs(dot) < min_dot,
                        jnp.where(dot < 0, -min_dot, min_dot), dot)
    if valid_mask is not None:
        dot = jnp.where(valid_mask, dot, 1.0)
    dists_theta = dists - (sdf_vals - sdf_vals_detached) / dot
    return cam_loc + dists_theta[..., None] * ray_dirs

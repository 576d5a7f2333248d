"""Masked-out degenerate lanes must not poison gradients with NaN.

A NaN produced in a backward pass survives multiplication by an
exactly-zero mask cotangent (0 * inf = NaN), so every norm in the loss
path needs a finite backward at the zero vector (torch defines the
subgradient 0 there — reference parity). The round-3 capstone discarded
976/1800 updates to this before losses._safe_norm: out-of-range grid
samples return exact-zero feature vectors whose norm backward was 0/0.
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from mvsdf_tpu.supervision.losses import (_safe_norm, eikonal_loss,
                                          feat_consistency_loss)
from mvsdf_tpu.config import Gates


def test_safe_norm_matches_plain_norm_away_from_zero():
    # jnp.linalg.norm reassociates the reduction differently, so roundoff-
    # level (not bitwise) agreement is the right contract here
    x = np.random.default_rng(0).normal(size=(64, 32)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(_safe_norm(jnp.asarray(x))),
        np.asarray(jnp.linalg.norm(jnp.asarray(x), axis=-1)),
        rtol=1e-6)


def test_safe_norm_zero_vector_grad_finite():
    g = jax.grad(lambda x: jnp.sum(_safe_norm(x)))(jnp.zeros((4, 3)))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_feat_loss_grad_finite_with_out_of_range_points():
    """Points projecting outside the feature map sample exact zeros; the
    lane is masked out of the loss but its gradient chain must be finite."""
    B, P, C, h, w, S = 1, 8, 4, 6, 6, 2
    rng = np.random.default_rng(1)
    # identity-ish cams: world_to_cam/cam_to_img consume (2, 4, 4) stacks
    cam = np.stack([np.eye(4, dtype=np.float32)] * 2)[None]
    cam[0, 1, 0, 0] = cam[0, 1, 1, 1] = 4.0   # fx, fy
    cam[0, 1, 0, 2] = cam[0, 1, 1, 2] = 3.0   # cx, cy
    src_cams = np.repeat(cam[:, None], S, axis=1)
    feat = rng.normal(size=(B, C, h, w)).astype(np.float32)
    feat_src = rng.normal(size=(B, S, C, h, w)).astype(np.float32)

    pts = rng.uniform(-0.2, 0.2, size=(B, P, 3)).astype(np.float32)
    pts[..., 2] += 1.0            # in front of the camera
    pts[0, 0] = (50.0, 50.0, 1.0)  # far out of range -> zero feature sample
    hit = np.ones((B, P), bool)
    hit[0, 0] = False             # and masked out, like a miss lane

    def loss(p):
        return feat_consistency_loss(p, jnp.asarray(hit), jnp.asarray(feat),
                                     jnp.asarray(cam), jnp.asarray(feat_src),
                                     jnp.asarray(src_cams), 1.0,
                                     jnp.zeros(3), feat_img_scale=1.0)

    val, g = jax.value_and_grad(loss)(jnp.asarray(pts))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))


def test_eikonal_grad_finite_with_masked_zero_gradient_lane():
    g_rows = np.ones((2, 5, 3), np.float32)
    g_rows[0, 0] = 0.0            # degenerate SDF gradient
    mask = np.ones((2, 5), np.float32)
    mask[0, 0] = 0.0              # masked out of the loss

    def loss(g):
        groups = {"eik": {"grad": g, "mask": jnp.asarray(mask)}}
        return eikonal_loss(groups, Gates(eik_use_eik=True))

    val, grad = jax.value_and_grad(loss)(jnp.asarray(g_rows))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))

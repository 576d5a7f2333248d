"""Visualization artifacts: rendered-vs-GT image grids, depth-map PNGs, and
3D scene snapshots.

Behavioral parity target: ``code/utils/plots.py`` (plot/plot_images/
plot_depth_maps/get_surface_trace). The reference renders plotly HTML; here
matplotlib (always available) writes PNGs, and the mesh snapshot is the OBJ
from eval.marching (viewable anywhere).
"""
from __future__ import annotations

import os

import numpy as np


def lin2img(flat, img_res):
    """(B, HW, C) -> (B, H, W, C) (ref plots.py:375-377)."""
    H, W = img_res
    return np.asarray(flat).reshape(-1, H, W, flat.shape[-1])


def plot_image_grid(path, rgb_pred, rgb_gt, img_res):
    """Side-by-side rendered vs ground-truth grid (ref plots.py:356-373).
    Inputs (B, HW, 3) in [-1, 1]."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pred = (lin2img(rgb_pred, img_res) + 1) / 2
    gt = (lin2img(rgb_gt, img_res) + 1) / 2
    B = pred.shape[0]
    fig, axes = plt.subplots(B, 2, figsize=(8, 4 * B), squeeze=False)
    for b in range(B):
        axes[b][0].imshow(np.clip(pred[b], 0, 1))
        axes[b][0].set_title("rendered")
        axes[b][1].imshow(np.clip(gt[b], 0, 1))
        axes[b][1].set_title("ground truth")
        for ax in axes[b]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def plot_depth_maps(path, depths, img_res):
    """Depth maps to a PNG grid (ref plots.py:342-354). depths (B, HW)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = lin2img(depths[..., None], img_res)[..., 0]
    B = d.shape[0]
    fig, axes = plt.subplots(1, B, figsize=(4 * B, 4), squeeze=False)
    for b in range(B):
        m = d[b] > 0
        vmin = d[b][m].min() if m.any() else 0
        axes[0][b].imshow(d[b], cmap="viridis", vmin=vmin)
        axes[0][b].axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def plot_scene_snapshot(path, verts, faces, cam_positions=None):
    """3D mesh + camera scatter snapshot (the reference's plotly scene plot,
    ref plots.py:12-65, as a static matplotlib render)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    if len(faces):
        sel = np.random.default_rng(0).choice(
            len(verts), size=min(20000, len(verts)), replace=False)
        ax.scatter(verts[sel, 0], verts[sel, 1], verts[sel, 2], s=0.2,
                   c=verts[sel, 2], cmap="viridis")
    if cam_positions is not None:
        ax.scatter(cam_positions[:, 0], cam_positions[:, 1],
                   cam_positions[:, 2], c="red", marker="^", s=30)
    ax.set_box_aspect((1, 1, 1))
    fig.savefig(path, dpi=100)
    plt.close(fig)

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


def _camera_cone_lines(pose, depth=0.3, half=0.18):
    """Wireframe viewing cone for one camera-to-world pose (4, 4): apex at
    the camera center, square base ``depth`` along the optical axis (the
    reference draws the same cones via plotly, ref plots.py:67-111)."""
    R = pose[:3, :3]
    c = pose[:3, 3]
    corners = np.array([[-half, -half, 1.0], [half, -half, 1.0],
                        [half, half, 1.0], [-half, half, 1.0]]) * depth
    base = (corners @ R.T) + c
    lines = [(c, b) for b in base]
    lines += [(base[i], base[(i + 1) % 4]) for i in range(4)]
    return lines


def plot_scene_snapshot(path, verts, faces, poses=None, face_colors=None,
                        points=None, max_faces=30000, elev=25, azim=-60):
    """Surface mesh + camera cones + optional point scatter — the static
    parity render of the reference's plotly HTML scene plot (ref
    plots.py:12-65: get_surface_trace mesh + get_3D_quiver_trace cameras +
    get_3D_scatter_trace points).

    verts (V, 3), faces (F, 3); poses (N, 4, 4) camera-to-world;
    face_colors optional (F,) scalars in [0, 1] (e.g. surface-indicator);
    points optional (M, 3) scatter overlay (e.g. traced intersections).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import (Poly3DCollection,
                                            Line3DCollection)

    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(projection="3d")
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    if len(faces):
        if len(faces) > max_faces:
            sel = np.random.default_rng(0).choice(
                len(faces), size=max_faces, replace=False)
            faces_d = faces[sel]
            fcol = None if face_colors is None else \
                np.asarray(face_colors)[sel]
        else:
            faces_d = faces
            fcol = None if face_colors is None else np.asarray(face_colors)
        tris = verts[faces_d]
        pc = Poly3DCollection(tris, linewidths=0.0)
        if fcol is not None:
            cmap = plt.get_cmap("viridis")
            pc.set_facecolor(cmap(np.clip(fcol, 0, 1)))
        else:
            # shade by face normal against a fixed light for depth cueing
            n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
            n = n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
            lum = np.clip(0.4 + 0.6 * np.abs(n @ np.array([0.4, 0.5,
                                                           0.77])), 0, 1)
            pc.set_facecolor(np.stack([lum * 0.6, lum * 0.7, lum], -1))
        ax.add_collection3d(pc)
    if points is not None and len(points):
        pts = np.asarray(points)
        sel = np.random.default_rng(1).choice(
            len(pts), size=min(5000, len(pts)), replace=False)
        ax.scatter(pts[sel, 0], pts[sel, 1], pts[sel, 2], s=0.5, c="red")
    if poses is not None:
        segs = []
        for p in np.asarray(poses):
            segs.extend(_camera_cone_lines(p))
        ax.add_collection3d(Line3DCollection(segs, colors="crimson",
                                             linewidths=0.8))
        cams = np.asarray(poses)[:, :3, 3]
        ax.scatter(cams[:, 0], cams[:, 1], cams[:, 2], c="crimson", s=8)
    # cube axes spanning everything drawn
    allpts = [verts] if len(verts) else []
    if poses is not None:
        allpts.append(np.asarray(poses)[:, :3, 3])
    if allpts:
        ap = np.concatenate(allpts, 0)
        lo, hi = ap.min(0), ap.max(0)
        c = (lo + hi) / 2
        r = float((hi - lo).max()) / 2 + 1e-6
        ax.set_xlim(c[0] - r, c[0] + r)
        ax.set_ylim(c[1] - r, c[1] + r)
        ax.set_zlim(c[2] - r, c[2] + r)
    ax.set_box_aspect((1, 1, 1))
    ax.view_init(elev=elev, azim=azim)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)

"""Synthetic-scene fixtures shared by golden end-to-end tests.

Builds a tiny consistent multi-view setup: pinhole cameras on a ring looking
at the origin, a unit-scale scene (size=2, center=0), plausible depth maps,
and random frozen feature maps — everything both the reference and our
framework need for a full forward+backward."""
import numpy as np


def make_scene_fibonacci(n=10, img_hw=48, depth_hw=24, n_pix=192,
                         feat_ch=16, sphere_radius=0.45, focal=84.0,
                         seed=21):
    """Well-conditioned reconstruction fixture: n cameras on a fibonacci
    sphere (full angular coverage) with depth maps of an analytic sphere.
    Ring-only coverage leaves occluded bands whose carving votes are all
    'inside' (true for the reference too); this layout avoids that."""
    golden = (1 + 5 ** 0.5) / 2
    idx = np.arange(n)
    z = 1 - 2 * (idx + 0.5) / n
    th = 2 * np.pi * idx / golden
    r = np.sqrt(1 - z * z)
    cam_pos = 2.2 * np.stack([r * np.cos(th), z * 0.8, r * np.sin(th)], -1)

    sc = make_scene(n_images=n, n_src=2, img_hw=img_hw, depth_hw=depth_hw,
                    n_pix=n_pix, seed=seed, feat_ch=feat_ch,
                    sphere_radius=sphere_radius, focal=focal)
    f = focal
    extr = np.stack([look_at_extrinsic(p) for p in cam_pos])
    K = np.array([[f, 0, img_hw / 2], [0, f, img_hw / 2], [0, 0, 1.0]])
    Kd = K.copy()
    Kd[:2] *= depth_hw / img_hw
    sc["pose"] = np.stack([np.linalg.inv(e) for e in extr]).astype(
        np.float32)
    intr = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    intr[:, :3, :3] = K
    sc["intrinsics"] = intr.astype(np.float32)
    dc = np.zeros((n, 1, 2, 4, 4), np.float32)
    for i in range(n):
        dc[i, 0, 0] = extr[i]
        dc[i, 0, 1, :3, :3] = Kd
    sc["depth_cams"] = dc
    h = w = depth_hw
    depths = np.zeros((n, 1, 1, h, w), np.float32)
    for i in range(n):
        ys, xs = np.mgrid[0:h, 0:w]
        pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)],
                       -1).reshape(-1, 3).astype(np.float64)
        dcam = (np.linalg.inv(Kd) @ pix.T).T
        R = extr[i][:3, :3]
        dw = dcam @ R
        dw /= np.linalg.norm(dw, axis=-1, keepdims=True)
        o = cam_pos[i]
        b = dw @ o
        disc = b ** 2 - (o @ o - sphere_radius ** 2)
        tq = -b - np.sqrt(np.maximum(disc, 0))
        zz = tq * dcam[:, 2] / np.linalg.norm(dcam, axis=-1)
        depths[i, 0, 0] = np.where(disc > 0, zz, 0).reshape(h, w)
    sc["depths"] = depths
    return sc


def _sphere_texture(p, radius):
    """View-independent procedural albedo on the sphere surface, in [-1, 1].
    p (..., 3) world points."""
    n = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-9)
    r = 0.6 * np.sin(7 * n[..., 0]) * np.cos(5 * n[..., 1])
    g = 0.6 * np.sin(6 * n[..., 1] + 1.3) * np.cos(4 * n[..., 2])
    b = 0.6 * np.sin(5 * n[..., 2] + 2.1) * np.cos(6 * n[..., 0])
    return np.stack([r, g, b], -1)


def render_shaded_sphere(cam_pos, extr, K, hw, radius,
                         light=(0.3, 0.8, 0.5), plane_y=-0.43,
                         plane_r=0.92):
    """Analytic lambertian render of the textured sphere resting IN a
    finite ground plane (the DTU analog: frontal cameras see the object on
    a table, depth maps densely constrain most rays, and the object+table
    surface is CONNECTED so biggest-component cleanup keeps both, like the
    reference expects). Returns
    rgb (hw, hw, 3) in [-1, 1] (white where neither is hit), depth
    (hw, hw) (0 = invalid), object mask (hw, hw)."""
    H = W = hw
    ys, xs = np.mgrid[0:H, 0:W]
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)],
                   -1).reshape(-1, 3).astype(np.float64)
    dirs_cam = (np.linalg.inv(K) @ pix.T).T
    R = extr[:3, :3]
    dirs_w = dirs_cam @ R
    nrm = np.linalg.norm(dirs_w, axis=-1, keepdims=True)
    dirs_w = dirs_w / nrm
    o = np.asarray(cam_pos, np.float64)
    b = dirs_w @ o

    disc = b ** 2 - (o @ o - radius ** 2)
    t_obj = -b - np.sqrt(np.maximum(disc, 0))
    hit_obj = (disc > 0) & (t_obj > 0)

    dy = dirs_w[:, 1]
    t_pl = np.where(np.abs(dy) > 1e-9, (plane_y - o[1]) / dy, -1.0)
    p_pl = o + t_pl[:, None] * dirs_w
    hit_pl = (t_pl > 0) & (p_pl[:, 0] ** 2 + p_pl[:, 2] ** 2 <
                           plane_r ** 2)
    # object occludes the plane where both hit
    hit_pl = hit_pl & (~hit_obj | (t_pl < t_obj))
    hit_obj = hit_obj & (~hit_pl)

    t = np.where(hit_obj, t_obj, np.where(hit_pl, t_pl, 0.0))
    pts = o + t[:, None] * dirs_w

    ldir = np.asarray(light, np.float64)
    ldir = ldir / np.linalg.norm(ldir)
    n_obj = pts / np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True),
                             1e-9)
    shade_obj = 0.35 + 0.65 * np.maximum(0.0, n_obj @ ldir)
    rgb_obj = np.clip(_sphere_texture(pts, radius) * shade_obj[:, None],
                      -1, 1)
    # plane: checker texture lit by the same light (normal +y)
    checker = (np.floor(pts[:, 0] * 6) + np.floor(pts[:, 2] * 6)) % 2
    base = np.where(checker > 0.5, 0.45, -0.1)
    shade_pl = 0.4 + 0.6 * max(0.0, float(ldir[1]))
    rgb_pl = np.stack([base * shade_pl + 0.1, base * shade_pl,
                       base * shade_pl - 0.1], -1)
    rgb = np.where(hit_obj[:, None], rgb_obj,
                   np.where(hit_pl[:, None], np.clip(rgb_pl, -1, 1), 1.0))
    z = t * dirs_cam[:, 2] / np.linalg.norm(dirs_cam, axis=-1)
    depth = np.where(hit_obj | hit_pl, z, 0.0)
    return (rgb.reshape(H, W, 3).astype(np.float32),
            depth.reshape(H, W).astype(np.float32),
            hit_obj.reshape(H, W))


def make_scene_shaded(n=12, img_hw=96, depth_hw=48, n_pix=4096,
                      sphere_radius=0.45, focal=None, seed=0,
                      feat_params=None, plane_r=0.92):
    """Fully coherent multi-view scene: fibonacci cameras, analytic
    lambertian renders of a textured sphere, analytic depth maps, and
    frozen-CNN features computed from the actual images (consistent across
    views — the feature-consistency loss gets real signal). Ground-truth
    surface = the radius-``sphere_radius`` sphere at the origin.

    plane_r=0 removes the ground plane (mask-tight object-only scene: the
    hit set collapses to the object mask — the supervised-compaction win
    regime when combined with a wide FoV, see auto_supervised_cascade)."""
    if focal is None:
        focal = 1.3 * img_hw
    sc = make_scene_fibonacci(n=n, img_hw=img_hw, depth_hw=depth_hw,
                              n_pix=n_pix, feat_ch=32,
                              sphere_radius=sphere_radius, focal=focal,
                              seed=seed)
    H = W = img_hw
    h = w = depth_hw
    Kd = sc["depth_cams"][0, 0, 1, :3, :3].astype(np.float64)
    K = sc["intrinsics"][0, :3, :3].astype(np.float64)

    # frontal-cap cameras (the DTU rig looks down at a table): elevations
    # 20-65 degrees above the horizon, golden-angle azimuths, radius 2.2
    golden = np.pi * (3 - np.sqrt(5))
    elev = np.deg2rad(np.linspace(20, 65, n))
    azim = golden * np.arange(n)
    cam_pos = 2.2 * np.stack([np.cos(elev) * np.cos(azim), np.sin(elev),
                              np.cos(elev) * np.sin(azim)], -1)
    extrs = np.stack([look_at_extrinsic(p) for p in cam_pos])
    sc["pose"] = np.stack([np.linalg.inv(e) for e in extrs]).astype(
        np.float32)
    dc = np.zeros((n, 1, 2, 4, 4), np.float32)
    for i in range(n):
        dc[i, 0, 0] = extrs[i]
        dc[i, 0, 1, :3, :3] = Kd
    sc["depth_cams"] = dc

    rgbs = []
    masks = []
    depths = np.zeros((n, 1, 1, h, w), np.float32)
    for i in range(n):
        extr = np.linalg.inv(sc["pose"][i].astype(np.float64))
        cam_pos = sc["pose"][i][:3, 3].astype(np.float64)
        rgb, _, m = render_shaded_sphere(cam_pos, extr, K, H, sphere_radius,
                                         plane_r=plane_r)
        _, z, _ = render_shaded_sphere(cam_pos, extr, Kd, h, sphere_radius,
                                       plane_r=plane_r)
        rgbs.append(rgb)
        masks.append(m)
        depths[i, 0, 0] = z
    sc["depths"] = depths

    # frozen-CNN features from the real images (ImageNet-normalized at
    # 2x depth res, head [2], like data/scene.py)
    import jax.numpy as jnp
    from mvsdf_tpu.data.featext import init_feat_ext, extract_features
    import cv2
    if feat_params is None:
        feat_params = init_feat_ext(np.random.default_rng(0))
    th, tw = h * 2, w * 2
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    imgs = []
    for rgb in rgbs:
        im = cv2.resize(rgb, (tw, th), interpolation=cv2.INTER_LINEAR)
        imgs.append((((im / 2 + 0.5) - mean) / std).transpose(2, 0, 1))
    feats = np.asarray(extract_features(feat_params,
                                        jnp.asarray(np.stack(imgs))))

    # nearest-2-camera source views per reference view
    cams = sc["pose"][:, :3, 3]
    src_idx = []
    for i in range(n):
        d = np.linalg.norm(cams - cams[i], axis=1)
        d[i] = np.inf
        src_idx.append(np.argsort(d)[:2])
    # cams_hd = 2x depth cams with this scene's extrinsics
    cams_hd = np.zeros((n, 2, 4, 4), np.float32)
    for i in range(n):
        cams_hd[i, 0] = np.linalg.inv(sc["pose"][i])
        cams_hd[i, 1, :3, :3] = Kd * 2
        cams_hd[i, 1, 2, 2] = 1.0

    sc["feat"] = feats
    sc["feat_src"] = np.stack([feats[s] for s in src_idx])
    sc["cam"] = cams_hd
    sc["src_cams"] = np.stack([cams_hd[s] for s in src_idx])

    # full-image data for subset sampling by the caller
    sc["rgb_full"] = np.stack(rgbs).reshape(n, H * W, 3)
    sc["mask_full"] = np.stack(masks).reshape(n, H * W)
    uv_full = np.stack(np.meshgrid(np.arange(W), np.arange(H)),
                       -1).reshape(-1, 2).astype(np.float32)
    sc["uv_full"] = uv_full
    rng = np.random.default_rng(seed)
    sel = rng.permutation(H * W)[:n_pix]
    sc["uv"] = np.tile(uv_full[sel][None], (n, 1, 1))
    sc["rgb"] = sc["rgb_full"][:, sel]
    sc["object_mask"] = sc["mask_full"][:, sel]
    return sc


def _conv2(img, k):
    """Small same-size 2D convolution (separable box) for smoothing."""
    from scipy.signal import convolve2d
    return convolve2d(img, k, mode="same", boundary="symm").astype(np.float32)


def look_at_extrinsic(cam_pos, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    c = np.asarray(cam_pos, np.float64)
    z = np.asarray(target, np.float64) - c
    z /= np.linalg.norm(z)
    x = np.cross(np.asarray(up, np.float64), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])  # world -> cam rows
    t = -R @ c
    E = np.eye(4)
    E[:3, :3] = R
    E[:3, 3] = t
    return E


def make_scene(n_images=2, n_src=2, img_hw=64, depth_hw=32, n_pix=64,
               seed=0, feat_ch=32, sphere_radius=0.6, focal=60.0,
               two_rings=False):
    """Returns dict of numpy arrays (float32) for both frameworks.
    two_rings places cameras at alternating elevations (better-conditioned
    coverage for reconstruction tests)."""
    rng = np.random.default_rng(seed)
    B = n_images
    H = W = img_hw
    h = w = depth_hw

    # cameras on a ring of radius 2.2
    angles = np.linspace(0, 2 * np.pi, B + n_src, endpoint=False)
    ys = (np.where(np.arange(B + n_src) % 2 == 0, 0.9, -0.5)
          if two_rings else 0.35 * np.ones(B + n_src))
    rad = np.sqrt(np.maximum(2.2 ** 2 - ys ** 2, 0.5))
    cam_pos = np.stack([rad * np.sin(angles), ys,
                        rad * np.cos(angles)], -1)
    extr = np.stack([look_at_extrinsic(p) for p in cam_pos])  # (B+S, 4, 4)

    f_hd = float(focal)
    K_hd = np.array([[f_hd, 0, W / 2], [0, f_hd, H / 2], [0, 0, 1.0]])
    # depth cams at depth resolution; cams_hd = 2x depth cams
    scale = h / H
    K_d = K_hd.copy() * 1.0
    K_d[0] *= scale
    K_d[1] *= scale

    def mvs_cam(E, K):
        cam = np.zeros((2, 4, 4))
        cam[0] = E
        cam[1][:3, :3] = K
        return cam

    depth_cams = np.stack([mvs_cam(extr[i], K_d) for i in range(B)])
    cams_hd = np.stack(
        [mvs_cam(extr[i], K_hd * np.diag([1, 1, 1]))
         for i in range(B + n_src)])
    # cams_hd intrinsics = 2x depth cams (feat_img_scale=2)
    for c in cams_hd:
        c[1][:3, :3] = K_d * 2
        c[1][2, 2] = 1.0

    # intrinsics/pose for ray generation (image_hd domain)
    intrinsics = np.tile(np.eye(4), (B, 1, 1))
    intrinsics[:, :3, :3] = K_hd
    pose = np.stack([np.linalg.inv(extr[i]) for i in range(B)])

    # plausible depth maps: distance from cam to a sphere of sphere_radius
    # around origin along each pixel ray (zero = invalid border)
    depths = np.zeros((B, 1, 1, h, w), np.float32)
    for i in range(B):
        ys, xs = np.mgrid[0:h, 0:w]
        pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1).reshape(
            -1, 3).astype(np.float64)
        Kinv = np.linalg.inv(K_d)
        dirs_cam = (Kinv @ pix.T).T
        R = extr[i][:3, :3]
        dirs_w = dirs_cam @ R  # R^T @ d
        dirs_w /= np.linalg.norm(dirs_w, axis=-1, keepdims=True)
        o = cam_pos[i]
        b = dirs_w @ o
        disc = b ** 2 - (o @ o - sphere_radius ** 2)
        tq = -b - np.sqrt(np.maximum(disc, 0))
        z = tq * (dirs_cam @ np.array([0, 0, 1.0])) / np.linalg.norm(
            dirs_cam, axis=-1)
        z = np.where(disc > 0, z, 0.0)
        depths[i, 0, 0] = z.reshape(h, w)

    uv_full = np.stack(np.meshgrid(np.arange(W), np.arange(H)),
                       -1).reshape(-1, 2).astype(np.float32)
    # random pixel subset shared across images (ref scene_dataset.py:244-248)
    sel = rng.permutation(H * W)[:n_pix]
    uv = np.tile(uv_full[sel][None], (B, 1, 1))

    # Smooth low-frequency feature fields with a shared component so that
    # cross-view correlations land on both sides of the 0.5 inlier threshold
    # (exercises the feature-consistency loss non-trivially).
    base = rng.normal(size=(feat_ch, h, w)).astype(np.float32)
    k = np.ones((5, 5), np.float32) / 25.0
    base = np.stack([_conv2(c, k) for c in base])
    feat = np.stack([base + 0.4 * rng.normal(
        size=base.shape).astype(np.float32) for _ in range(B)])
    feat_src = np.stack([np.stack([base + 0.4 * rng.normal(
        size=base.shape).astype(np.float32) for _ in range(n_src)])
        for _ in range(B)])
    src_cams = np.stack([cams_hd[B:][:n_src] for _ in range(B)])

    return dict(
        uv=uv.astype(np.float32),
        intrinsics=intrinsics.astype(np.float32),
        pose=pose.astype(np.float32),
        object_mask=np.ones((B, n_pix), bool),
        rgb=rng.uniform(-1, 1, (B, n_pix, 3)).astype(np.float32),
        depths=depths,
        depth_cams=np.tile(depth_cams[:, None], (1, 1, 1, 1, 1)).astype(
            np.float32).reshape(B, 1, 2, 4, 4),
        cam=cams_hd[:B].astype(np.float32),
        src_cams=src_cams.astype(np.float32),
        feat=feat,
        feat_src=feat_src,
        size=np.full((B,), 2.0, np.float32),
        center=np.zeros((B, 3), np.float32),
    )

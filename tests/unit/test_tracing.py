import numpy as np
import jax
import jax.numpy as jnp

from mvsdf_tpu.tracing import TracerConfig, trace_rays


def sphere_sdf(center, radius):
    c = jnp.asarray(center, jnp.float32)

    def f(x):
        return jnp.linalg.norm(x - c, axis=-1) - radius
    return f


def make_rays(n, seed=0, spread=0.5, cam=(0.0, 0.0, 2.5)):
    rng = np.random.default_rng(seed)
    cam_loc = np.array([cam], np.float32)
    targets = rng.uniform(-spread, spread, (1, n, 3)).astype(np.float32)
    dirs = targets - cam_loc[:, None, :]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    org = np.tile(cam_loc, (n, 1))
    return jnp.asarray(org), jnp.asarray(dirs[0])


def analytic_sphere_hit(cam, dirs, center, radius):
    """Closed-form first intersection distance (nan if miss)."""
    o = np.asarray(cam)[0] - np.asarray(center)
    d = np.asarray(dirs)
    b = d @ o
    disc = b ** 2 - (o @ o - radius ** 2)
    t = -b - np.sqrt(np.maximum(disc, 0))
    t[disc < 0] = np.nan
    return t


def test_trace_hits_analytic_sphere():
    cfg = TracerConfig()
    center = (0.05, -0.1, 0.02)
    radius = 0.55
    sdf = sphere_sdf(center, radius)
    cam, dirs = make_rays(256, spread=0.4)
    om = jnp.ones((256,), bool)
    res = trace_rays(cfg, sdf, cam, dirs, om, training=False)
    t_true = analytic_sphere_hit(cam, dirs, center, radius)
    hit_true = np.isfinite(t_true) & (t_true > 0)
    hits = np.asarray(res.network_object_mask)
    # all analytic hits must be found
    assert (hits & hit_true).sum() >= 0.98 * hit_true.sum()
    d = np.asarray(res.dists)
    err = np.abs(d[hits & hit_true] - t_true[hits & hit_true])
    assert err.max() < 5e-4
    # points are on the surface
    pts = np.asarray(res.points)[hits]
    r_err = np.abs(np.linalg.norm(pts - np.array(center), axis=-1) - radius)
    assert r_err.max() < 5e-4


def test_trace_miss_rays_marked():
    cfg = TracerConfig()
    sdf = sphere_sdf((0, 0, 0), 0.3)
    # rays pointing away from the object sphere
    cam = jnp.asarray(np.tile(np.array([[0.0, 0.0, 2.0]], np.float32),
                              (64, 1)))
    dirs = jnp.asarray(np.tile(np.array([[0.0, 0.0, 1.0]], np.float32),
                               (64, 1)))
    om = jnp.ones((64,), bool)
    res = trace_rays(cfg, sdf, cam, dirs, om, training=False)
    assert not bool(np.asarray(res.network_object_mask).any())


def test_trace_training_fills_all_rays():
    cfg = TracerConfig()
    sdf = sphere_sdf((0, 0, 0), 0.5)
    cam, dirs = make_rays(128, spread=1.4)  # many rays miss the object
    om = jnp.ones((128,), bool)
    key = jax.random.PRNGKey(0)
    res = trace_rays(cfg, sdf, cam, dirs, om, training=True, key=key)
    assert np.isfinite(np.asarray(res.points)).all()
    assert np.isfinite(np.asarray(res.dists)).all()
    # miss rays get the min-SDF point: its SDF should be small-ish and the
    # point near the ray's closest approach to the sphere
    miss = ~np.asarray(res.network_object_mask)
    if miss.any():
        svals = np.asarray(sdf(res.points))[miss]
        assert (svals > -1e-3).all()


def test_trace_is_jittable():
    cfg = TracerConfig(sample_chunk=0)
    sdf = sphere_sdf((0, 0, 0), 0.5)
    cam, dirs = make_rays(64)
    om = jnp.ones((64,), bool)

    fn = jax.jit(lambda c, d: trace_rays(cfg, sdf, c, d, om, training=False))
    res = fn(cam, dirs)
    res2 = trace_rays(cfg, sdf, cam, dirs, om, training=False)
    np.testing.assert_allclose(np.asarray(res.dists), np.asarray(res2.dists),
                               atol=1e-6)


def test_secant_converges_tighter_than_sampling():
    # Torus SDF: sampler interval is coarse, secant must refine to ~1e-4.
    def torus(x):
        R, r = 0.5, 0.2
        q = jnp.stack([jnp.linalg.norm(x[..., :2], axis=-1) - R, x[..., 2]],
                      axis=-1)
        return jnp.linalg.norm(q, axis=-1) - r

    cfg = TracerConfig()
    cam = jnp.asarray(np.tile(np.array([[0.0, -1.8, 0.9]], np.float32),
                              (128, 1)))
    rng = np.random.default_rng(3)
    targets = rng.uniform(-0.6, 0.6, (128, 3)).astype(np.float32)
    targets[..., 2] *= 0.3
    dirs = targets - np.asarray(cam)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    om = jnp.ones((128,), bool)
    res = trace_rays(cfg, torus, cam, jnp.asarray(dirs), om, training=False)
    hits = np.asarray(res.network_object_mask)
    assert hits.sum() > 10
    sv = np.abs(np.asarray(torus(res.points)))[hits]
    assert np.median(sv) < 1e-4
    assert sv.max() < 5e-3

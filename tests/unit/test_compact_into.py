"""compact_call_into (direct predicated scatter into caller merge targets)
must be bit-equal — values AND gradients — to the round-4 layout
(legacy_compact_call_into: zeros out_builders + call-site where-merge),
across tiers, overflow, subset out_masks, bool outputs, and the
unpredicated (out_masks=None) write mode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvsdf_tpu.compaction import (compact_call, compact_call_into,
                                  legacy_compact_call_into)

R = 64


def _fn(x, y):
    # two fp outputs + one bool output per row
    s = jnp.sin(x).sum(-1) + (y ** 2).sum(-1)
    return jnp.stack([s, -s, 2 * s], -1), s * 0.5, s > 0.2


def _data(seed=0, frac=0.4):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(R, 2)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=R) < frac)
    t0 = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    t1 = jnp.asarray(rng.normal(size=R).astype(np.float32))
    t2 = jnp.asarray(rng.uniform(size=R) < 0.5)
    return x, y, mask, (t0, t1, t2)


@pytest.mark.parametrize("caps", [16, (8, 24), (2, 4), (8, 16, 48), 128])
@pytest.mark.parametrize("submask", [False, True])
def test_into_matches_legacy_values(caps, submask):
    x, y, mask, targets = _data()
    om = None
    if submask:
        sub = mask & (jnp.arange(R) % 3 != 0)
        om = (mask, sub, mask)
    if om is None:
        # unpredicated mode requires fn(non-mask row) == target row; use
        # targets built from the dense outputs so the contract holds
        dense = _fn(x, y)
        targets = tuple(jnp.asarray(d) for d in dense)
    new = compact_call_into(_fn, mask, caps, (x, y), targets, out_masks=om)
    old = legacy_compact_call_into(_fn, mask, caps, (x, y), targets,
                                   out_masks=om)
    for a, b in zip(new, old):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_into_keeps_target_rows_outside_out_mask():
    x, y, mask, targets = _data()
    sub = mask & (jnp.arange(R) % 2 == 0)
    outs = compact_call_into(_fn, mask, 32, (x, y), targets,
                             out_masks=(mask, sub, sub))
    m0, m1 = np.asarray(mask), np.asarray(sub)
    for o, t, m in zip(outs, targets, (m0, m1, m1)):
        np.testing.assert_array_equal(np.asarray(o)[~m], np.asarray(t)[~m])
    # merged rows carry the fn values (allclose, not bit-equal: libm sin
    # vectorizes differently over the gathered 32-row batch than the dense
    # 64-row batch — a 1-ulp layout effect, not a semantics difference)
    dense = _fn(x, y)
    for o, d, m in zip(outs, dense, (m0, m1, m1)):
        np.testing.assert_allclose(np.asarray(o)[m], np.asarray(d)[m],
                                   atol=1e-6)


@pytest.mark.parametrize("caps", [16, (8, 24), 2])
def test_into_gradients_match_legacy(caps):
    x, y, mask, targets = _data()
    sub = mask & (jnp.arange(R) % 3 != 0)
    om = (mask, sub, mask)

    def loss(impl, x, y, t0, t1):
        a, b, _ = impl(_fn, mask, caps, (x, y), (t0, t1, targets[2]),
                       out_masks=om)
        return (a * a).sum() + jnp.abs(b).sum()

    g_new = jax.grad(lambda *a: loss(compact_call_into, *a), argnums=(0, 1, 2, 3))(
        x, y, targets[0], targets[1])
    g_old = jax.grad(lambda *a: loss(legacy_compact_call_into, *a),
                     argnums=(0, 1, 2, 3))(x, y, targets[0], targets[1])
    for gn, go in zip(g_new, g_old):
        np.testing.assert_allclose(np.asarray(gn), np.asarray(go),
                                   atol=1e-6, rtol=1e-6)


def test_into_unpredicated_matches_compact_call_on_builder_targets():
    # out_masks=None with targets used as builders is the old mid-march
    # form: identical to compact_call with out_builders=targets
    x, y, mask, _ = _data()
    dense = _fn(x, y)
    targets = tuple(jnp.asarray(d) for d in dense)  # frozen-lane no-op holds
    new = compact_call_into(_fn, mask, (8, 24), (x, y), targets)
    old = compact_call(_fn, mask, (8, 24), (x, y), targets)
    for a, b in zip(new, old):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_into_under_jit_and_tier_selection():
    x, y, mask, targets = _data(frac=0.2)  # count ~13 -> middle tier of 3
    om = (mask, mask, mask)
    f = jax.jit(lambda x, y: compact_call_into(_fn, mask, (4, 16, 48),
                                               (x, y), targets,
                                               out_masks=om))
    outs = f(x, y)
    legacy = legacy_compact_call_into(_fn, mask, (4, 16, 48), (x, y),
                                      targets, out_masks=om)
    for a, b in zip(outs, legacy):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Inverse-depth tests, cross-checked against a scalar port of the
reference's strategies (ref src/core/inverse_depth.rs)."""

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.core import inverse_depth as idp


def scalar_dso_mean(values):
    """Scalar port of strategy_dso_mean (inverse_depth.rs:81-98)."""
    if len(values) == 0 or len(values) > 4:
        return None  # Unknown
    s = sum(v for _, v in values)
    d = sum(d * v for d, v in values) / s
    return (d, s)


def scalar_stat_similar(values):
    """Scalar port of strategy_statistically_similar (inverse_depth.rs:105-152).

    Returns (d, v), 'discarded' or None (unknown).
    """
    k = len(values)
    if k == 0 or k > 4:
        return None
    if k == 1:
        d1, v1 = values[0]
        return (d1, 2.0 * v1)
    ds = [d for d, _ in values]
    vs = [v for _, v in values]
    import math

    prod_all = math.prod(vs)
    prod_others = [prod_all / v for v in vs]
    new_d = sum(d * p for d, p in zip(ds, prod_others)) / sum(prod_others)
    new_v = (2.0 / k) * (sum(vs) / k)
    if all((d - new_d) ** 2 < new_v for d in ds):
        return (new_d, new_v)
    return "discarded"


def make_map(block_vals):
    """Build a 2x2 InverseDepthMap from a list of ((corner), d, v) entries."""
    d = np.zeros((2, 2), np.float32)
    v = np.zeros((2, 2), np.float32)
    s = np.zeros((2, 2), np.uint8)
    for (i, j), dv, vv in block_vals:
        d[i, j], v[i, j], s[i, j] = dv, vv, idp.WITH_VARIANCE
    return idp.InverseDepthMap(jnp.asarray(d), jnp.asarray(v), jnp.asarray(s))


def test_from_depth_and_back():
    depth = jnp.array([[0, 5000], [2500, 10000]], jnp.uint16)
    m = idp.from_depth(5000.0, depth, 1e-4)
    np.testing.assert_array_equal(np.asarray(m.state), [[0, 2], [2, 2]])
    np.testing.assert_allclose(np.asarray(m.idepth), [[0, 1.0], [2.0, 0.5]])
    back = idp.to_depth(5000.0, m)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(depth))


def test_dso_mean_matches_scalar():
    rng = np.random.default_rng(0)
    for trial in range(50):
        k = rng.integers(0, 5)
        corners = rng.permutation(4)[:k]
        entries = [
            (divmod(int(c), 2), rng.uniform(0.2, 3.0), rng.uniform(1e-5, 1e-3))
            for c in corners
        ]
        m = make_map(entries)
        fused = idp.fuse_dso_mean(m)
        expected = scalar_dso_mean([(d, v) for _, d, v in entries])
        if expected is None:
            assert int(fused.state[0, 0]) == idp.UNKNOWN
        else:
            assert int(fused.state[0, 0]) == idp.WITH_VARIANCE
            np.testing.assert_allclose(float(fused.idepth[0, 0]), expected[0], rtol=1e-5)
            np.testing.assert_allclose(float(fused.variance[0, 0]), expected[1], rtol=1e-5)


def test_stat_similar_matches_scalar():
    rng = np.random.default_rng(1)
    n_discarded = 0
    for trial in range(80):
        k = rng.integers(0, 5)
        corners = rng.permutation(4)[:k]
        # mix of close and far values to exercise both gate outcomes
        base = rng.uniform(0.5, 2.0)
        entries = [
            (
                divmod(int(c), 2),
                base + rng.normal() * (0.001 if trial % 2 else 0.5),
                rng.uniform(1e-5, 1e-3),
            )
            for c in corners
        ]
        m = make_map(entries)
        fused = idp.fuse_statistically_similar(m)
        expected = scalar_stat_similar([(d, v) for _, d, v in entries])
        if expected is None:
            assert int(fused.state[0, 0]) == idp.UNKNOWN
        elif expected == "discarded":
            assert int(fused.state[0, 0]) == idp.DISCARDED
            n_discarded += 1
        else:
            assert int(fused.state[0, 0]) == idp.WITH_VARIANCE
            np.testing.assert_allclose(float(fused.idepth[0, 0]), expected[0], rtol=1e-4)
            np.testing.assert_allclose(float(fused.variance[0, 0]), expected[1], rtol=1e-4)
    assert n_discarded > 0  # the gate actually fired at least once


def test_discarded_inputs_are_ignored():
    # A Discarded input behaves like Unknown for fusion purposes: the
    # reference's fuse() only forwards WithVariance values (inverse_depth.rs:49-74).
    m = idp.InverseDepthMap(
        jnp.array([[1.0, 0.0], [0.0, 0.0]], jnp.float32),
        jnp.array([[1e-4, 0.0], [0.0, 0.0]], jnp.float32),
        jnp.array([[2, 1], [1, 0]], jnp.uint8),
    )
    fused = idp.fuse_dso_mean(m)
    assert int(fused.state[0, 0]) == idp.WITH_VARIANCE
    np.testing.assert_allclose(float(fused.idepth[0, 0]), 1.0)


def test_pyramid_levels():
    depth = jnp.asarray(
        np.random.default_rng(2).integers(0, 20000, (16, 16), np.uint16)
    )
    m = idp.from_depth(5000.0, depth, 1e-4)
    pyr = idp.pyramid(m, 4)
    assert len(pyr) == 4
    assert pyr[-1].idepth.shape == (2, 2)
    # weights (variances) add along the dso pyramid
    assert float(jnp.max(pyr[-1].variance)) <= 64 * 1e-4 + 1e-9


def test_masked():
    depth = jnp.full((4, 4), 5000, jnp.uint16)
    m = idp.from_depth(5000.0, depth, 1e-4)
    mask = jnp.zeros((4, 4), bool).at[1, 2].set(True)
    mm = idp.masked(m, mask)
    assert int(jnp.sum(mm.known)) == 1
    assert bool(mm.known[1, 2])

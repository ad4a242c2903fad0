"""Property-based tests (hypothesis) — the analog of the reference's
quickcheck suites (so3.rs:103-149, se3.rs:133-182), extended to the image
ops the reference never property-tested.

Strategy: hypothesis draws seeds; inputs are generated with seeded numpy
RNGs (fast, shrinkable, and the function under test is jitted once)."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from visual_odometry_rs_tpu.math import pose as pose_mod, se3, so3
from visual_odometry_rs_tpu.ops import interp, pyramid

SEEDS = st.integers(min_value=0, max_value=2**32 - 1)
COMMON = settings(max_examples=25, deadline=None)


def _rand_twist(seed, scale):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-scale, scale, 6), jnp.float32)


@COMMON
@given(SEEDS)
def test_so3_log_exp_roundtrip(seed):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.uniform(-1.5, 1.5, 3), jnp.float32)  # |theta| < pi
    q = so3.exp(w)
    w2 = so3.log(q)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), rtol=1e-4, atol=1e-6)


@COMMON
@given(SEEDS)
def test_so3_hat_vee_roundtrip(seed):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=3), jnp.float32)
    np.testing.assert_array_equal(np.asarray(so3.vee(so3.hat(w))), np.asarray(w))


@COMMON
@given(SEEDS)
def test_so3_hat2_is_hat_squared(seed):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=3), jnp.float32)
    h = np.asarray(so3.hat(w))
    np.testing.assert_allclose(np.asarray(so3.hat_2(w)), h @ h, rtol=1e-5, atol=1e-6)


@COMMON
@given(SEEDS)
def test_se3_log_exp_roundtrip(seed):
    xi = _rand_twist(seed, 1.0)
    p = se3.exp(xi)
    xi2 = se3.log(p)
    # the reference documents f32 se3 roundtrips are only good to ~1e-4
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), rtol=2e-3, atol=1e-4)


@COMMON
@given(SEEDS)
def test_pose_compose_inverse_is_identity(seed):
    p = se3.exp(_rand_twist(seed, 0.8))
    i = pose_mod.compose(p, pose_mod.inverse(p))
    np.testing.assert_allclose(np.asarray(i.t), 0.0, atol=1e-5)
    np.testing.assert_allclose(abs(float(i.q[0])), 1.0, atol=1e-5)


@COMMON
@given(SEEDS)
def test_pose_compose_associative(seed):
    a = se3.exp(_rand_twist(seed, 0.5))
    b = se3.exp(_rand_twist(seed + 1, 0.5))
    c = se3.exp(_rand_twist(seed + 2, 0.5))
    left = pose_mod.compose(pose_mod.compose(a, b), c)
    right = pose_mod.compose(a, pose_mod.compose(b, c))
    np.testing.assert_allclose(np.asarray(left.t), np.asarray(right.t), atol=2e-5)
    np.testing.assert_allclose(
        np.abs(np.asarray(left.q)), np.abs(np.asarray(right.q)), atol=2e-5
    )


_bilinear_gather = jax.jit(interp.bilinear_gather)
_bilinear_onehot = jax.jit(interp.bilinear_onehot)


@COMMON
@given(SEEDS)
def test_bilinear_onehot_matches_gather_u8(seed):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.integers(0, 256, size=(24, 40)), jnp.uint8)
    # include out-of-domain points on purpose
    x = jnp.asarray(rng.uniform(-4, 44, 64), jnp.float32)
    y = jnp.asarray(rng.uniform(-4, 28, 64), jnp.float32)
    v1, m1 = _bilinear_gather(img, x, y)
    v2, m2 = _bilinear_onehot(img, x, y)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-6, atol=1e-4)


_mean_pyr = jax.jit(lambda i: pyramid.mean_pyramid(3, i))


@COMMON
@given(SEEDS)
def test_mean_pyramid_matches_numpy_reference(seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(16, 20), dtype=np.uint8)
    levels = _mean_pyr(jnp.asarray(img))
    ref = img.astype(np.int32)
    for lvl in levels[1:]:
        h, w = ref.shape
        h2, w2 = h // 2, w // 2
        blk = ref[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2)
        # the reference's u8 mean: (a+b+c+d)/4 with truncation toward zero
        ref = (blk[:, 0, :, 0] + blk[:, 0, :, 1] + blk[:, 1, :, 0] + blk[:, 1, :, 1]) // 4
        np.testing.assert_array_equal(np.asarray(lvl), ref.astype(np.uint8))


@COMMON
@given(SEEDS)
def test_trajectory_serialization_roundtrip(seed):
    """TUM line format: serialize -> parse recovers timestamp and pose."""
    from visual_odometry_rs_tpu.dataset import tum_rgbd

    rng = np.random.default_rng(seed)
    p = se3.exp(_rand_twist(seed, 1.0))
    ts = float(np.round(rng.uniform(0, 2e9), 6))
    line = tum_rgbd.Frame(timestamp=ts, pose=p).to_string()
    back = tum_rgbd.parse_trajectory(line)[0]
    assert back.timestamp == ts
    np.testing.assert_allclose(np.asarray(back.pose.t), np.asarray(p.t), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.pose.q), np.asarray(p.q), rtol=1e-6)


@COMMON
@given(SEEDS)
def test_associations_parse_ignores_comments_and_blanks(seed):
    from visual_odometry_rs_tpu.dataset import tum_rgbd

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 6))
    lines = ["# header comment"]
    entries = []
    for i in range(n):
        dts = float(np.round(rng.uniform(0, 1e9), 6))
        cts = float(np.round(rng.uniform(0, 1e9), 6))
        entries.append((dts, cts))
        lines.append(f"{dts:.6f} depth/{i}.png {cts:.6f} rgb/{i}.png")
        if rng.random() < 0.5:
            lines.append("")
        if rng.random() < 0.3:
            lines.append("# interleaved comment")
    out = tum_rgbd.parse_associations("\n".join(lines))
    assert len(out) == n
    for a, (dts, cts) in zip(out, entries):
        assert abs(a.depth_timestamp - dts) < 1e-9
        assert abs(a.color_timestamp - cts) < 1e-9

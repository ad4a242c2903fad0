"""Property tests for se3, mirroring reference ``src/math/se3.rs:133-182``.

Reference epsilon: exp∘log roundtrip ~1e-4 relative in f32 (se3.rs:140-142).
"""

import jax
import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.math import pose, se3

N = 512


def test_hat_vee_roundtrip():
    xi = 10.0 * jax.random.normal(jax.random.PRNGKey(0), (N, 6), dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(se3.vee(se3.hat(xi))), np.asarray(xi))


def test_exp_log_roundtrip_at_identity():
    xi = jnp.zeros((6,), jnp.float32)
    np.testing.assert_array_equal(np.asarray(se3.log(se3.exp(xi))), np.zeros(6))


def _random_pose(key, n=N):
    k1, k2 = jax.random.split(key)
    angles = jax.random.uniform(k1, (n, 3), minval=-3.0, maxval=3.0)
    q = pose.from_euler_angles(angles[:, 0], angles[:, 1], angles[:, 2])
    t = 5.0 * jax.random.normal(k2, (n, 3), dtype=jnp.float32)
    return pose.Pose(q, t)


def test_log_exp_roundtrip():
    # exp(log(iso)) == iso within the reference's documented 1e-4 (se3.rs:140-142).
    p = _random_pose(jax.random.PRNGKey(1))
    p2 = se3.exp(se3.log(p))
    # Compare rotations up to the quaternion double cover.
    sign = jnp.sign(jnp.sum(p.q * p2.q, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(p2.q * sign), np.asarray(p.q), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p2.t), np.asarray(p.t), rtol=1e-3, atol=1e-4)


def test_exp_log_roundtrip_twists():
    key = jax.random.PRNGKey(2)
    kv, kw = jax.random.split(key)
    v = 2.0 * jax.random.normal(kv, (N, 3), dtype=jnp.float32)
    # keep |w| < pi so log returns the same branch
    w_dir = jax.random.normal(kw, (N, 3), dtype=jnp.float32)
    w_dir = w_dir / jnp.linalg.norm(w_dir, axis=-1, keepdims=True)
    mag = jax.random.uniform(kw, (N, 1), minval=0.0, maxval=3.0)
    xi = jnp.concatenate([v, w_dir * mag], axis=-1)
    xi2 = se3.log(se3.exp(xi))
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4, rtol=1e-3)


def test_exp_small_angle_taylor_branch():
    key = jax.random.PRNGKey(3)
    xi = jnp.concatenate(
        [
            jax.random.normal(key, (N, 3), dtype=jnp.float32),
            1e-3 * jax.random.normal(jax.random.PRNGKey(4), (N, 3), dtype=jnp.float32),
        ],
        axis=-1,
    )
    xi2 = se3.log(se3.exp(xi))
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-5, rtol=1e-4)


def test_pose_compose_inverse():
    p = _random_pose(jax.random.PRNGKey(5))
    ident = pose.compose(p, pose.inverse(p))
    np.testing.assert_allclose(
        np.asarray(jnp.abs(ident.q[:, 0])), np.ones(N), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(ident.q[:, 1:]), np.zeros((N, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident.t), np.zeros((N, 3)), atol=1e-4)


def test_pose_apply_matches_matrix():
    p = _random_pose(jax.random.PRNGKey(6), n=32)
    x = jax.random.normal(jax.random.PRNGKey(7), (32, 3), dtype=jnp.float32)
    y = pose.apply(p, x)
    R = pose.rotation_matrix(p.q)
    y_mat = jnp.einsum("nij,nj->ni", R, x) + p.t
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_mat), atol=1e-5)


def test_exp_is_homomorphism_for_collinear():
    # exp(a xi) exp(b xi) = exp((a+b) xi) for collinear twists.
    xi = jnp.array([0.3, -0.2, 0.5, 0.1, 0.2, -0.3], jnp.float32)
    p1 = se3.exp(0.4 * xi)
    p2 = se3.exp(0.6 * xi)
    p12 = pose.compose(p1, p2)
    p_sum = se3.exp(xi)
    np.testing.assert_allclose(np.asarray(p12.q), np.asarray(p_sum.q), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p12.t), np.asarray(p_sum.t), atol=1e-5)


def test_renormalize_first_order():
    q = jnp.array([1.001, 0.01, -0.02, 0.005], jnp.float32)
    p = pose.renormalize_first_order(pose.Pose(q, jnp.zeros(3)))
    norm = float(jnp.linalg.norm(p.q))
    assert abs(norm - 1.0) < 1e-5


def test_adjoint_conjugation_property():
    """exp(Adj(p) xi) == p exp(xi) p^-1 for small xi (the transport used by
    the sliding window's keyframe-switch prior transfer)."""
    import numpy as np

    from visual_odometry_rs_tpu.math import pose as pose_mod

    rng = np.random.default_rng(0)
    for _ in range(10):
        p = se3.exp(jnp.asarray(rng.normal(size=6) * 0.3, jnp.float32))
        xi = jnp.asarray(rng.normal(size=6) * 1e-3, jnp.float32)
        lhs = se3.log(
            pose_mod.compose(pose_mod.compose(p, se3.exp(xi)), pose_mod.inverse(p))
        )
        rhs = se3.adjoint(p) @ xi
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)

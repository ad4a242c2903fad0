"""Property tests for so3, mirroring reference ``src/math/so3.rs:103-149``.

Reference epsilons: exp∘log roundtrip ~1e-6 relative (so3.rs:110-112).
quickcheck is replaced by seeded ``jax.random`` sweeps (deterministic).
"""

import jax
import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.math import pose, so3

N = 512


def random_w(key, scale=10.0):
    return scale * jax.random.normal(key, (N, 3), dtype=jnp.float32)


def test_hat_vee_roundtrip():
    w = random_w(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(so3.vee(so3.hat(w))), np.asarray(w))


def test_hat_2_ok():
    w = random_w(jax.random.PRNGKey(1))
    h = so3.hat(w)
    np.testing.assert_allclose(
        np.asarray(so3.hat_2(w)), np.asarray(h @ h), rtol=1e-6, atol=1e-4
    )


def test_exp_log_roundtrip_at_identity():
    w = jnp.zeros((3,), jnp.float32)
    np.testing.assert_array_equal(np.asarray(so3.log(so3.exp(w))), np.zeros(3))


def test_log_exp_roundtrip():
    # Generate rotations from Euler angles like the reference generator
    # (so3.rs:146-148), then check exp(log(q)) == q within 1e-6.
    key = jax.random.PRNGKey(2)
    angles = jax.random.uniform(key, (N, 3), minval=-3.0, maxval=3.0)
    q = pose.from_euler_angles(angles[:, 0], angles[:, 1], angles[:, 2])
    q2 = so3.exp(so3.log(q))
    # q and -q are the same rotation (double cover): exp∘log returns the
    # w >= 0 representative, so compare after canonicalizing the sign.
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2 * sign), np.asarray(q), rtol=1e-5, atol=2e-6)


def test_exp_log_roundtrip_small_angles():
    # Exercise the Taylor branch specifically (|w| < 1e-2).
    key = jax.random.PRNGKey(3)
    w = 1e-3 * jax.random.normal(key, (N, 3), dtype=jnp.float32)
    w2 = so3.log(so3.exp(w))
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), rtol=1e-5, atol=1e-9)


def test_exp_matches_rotation_matrix():
    # exp of axis-angle must equal the Rodrigues rotation matrix.
    key = jax.random.PRNGKey(4)
    w = random_w(key, scale=2.0)
    q = so3.exp(w)
    R_q = pose.rotation_matrix(q)

    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    K = so3.hat(w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-20))
    R_rod = jnp.eye(3) + jnp.sin(theta) * K + (1 - jnp.cos(theta)) * (K @ K)
    np.testing.assert_allclose(np.asarray(R_q), np.asarray(R_rod), atol=2e-6)


def test_jit_and_vmap_safe():
    w = random_w(jax.random.PRNGKey(5))
    jitted = jax.jit(lambda w: so3.log(so3.exp(w)))
    # jit may reassociate f32 arithmetic; allow small numerical slack.
    np.testing.assert_allclose(
        np.asarray(jitted(w)), np.asarray(so3.log(so3.exp(w))), rtol=1e-4, atol=1e-5
    )
    vmapped = jax.vmap(lambda w: so3.exp(w))
    np.testing.assert_allclose(np.asarray(vmapped(w)), np.asarray(so3.exp(w)), rtol=1e-6)

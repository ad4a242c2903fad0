"""Ring ppermute collectives on the virtual 8-device mesh.

Ground truth is the XLA collective (psum / all_gather); the ring forms must
match exactly up to f32 summation order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from visual_odometry_rs_tpu.parallel import ba, collectives, mesh as mesh_mod


N = 8


@pytest.fixture(scope="module")
def mesh():
    return mesh_mod.make_mesh((N,), ("x",))


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def test_ring_reduce_scatter_matches_psum(mesh):
    rng = np.random.default_rng(0)
    # per-chip contribution: (N * 4, 3) — chip i should end with chunk i of
    # the cross-chip sum
    x = jnp.asarray(rng.normal(size=(N, N * 4, 3)), jnp.float32)

    def f(xl):
        xl = xl.reshape(xl.shape[1:])  # drop the sharded leading dim of 1
        out = collectives.ring_reduce_scatter(xl, "x", N)
        return out[None]

    got = _shard_map(f, mesh, (P("x", None, None),), P("x", None, None))(x)
    want = np.asarray(jnp.sum(x, axis=0)).reshape(N, 4, 3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_ring_all_gather_matches_all_gather(mesh):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, 2, 5)), jnp.float32)

    def f(xl):
        xl = xl.reshape(xl.shape[1:])
        return collectives.ring_all_gather(xl, "x", N)[None]

    got = _shard_map(f, mesh, (P("x", None, None),), P("x", None, None))(x)
    want = np.asarray(x).reshape(N * 2, 5)
    for i in range(N):
        np.testing.assert_array_equal(np.asarray(got[i]), want)


def test_ring_all_reduce_matches_psum(mesh):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(N, N * 2, 6)), jnp.float32)

    def f(xl):
        xl = xl.reshape(xl.shape[1:])
        ring = collectives.ring_all_reduce(xl, "x", N)
        ref = jax.lax.psum(xl, "x")
        return ring[None], ref[None]

    ring, ref = _shard_map(
        f, mesh, (P("x", None, None),), (P("x", None, None), P("x", None, None))
    )(x)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_ba_ring_assembly_matches_psum(mesh_unused=None):
    from tests.test_ba import make_problem

    problem, _, _ = make_problem(K=8, P=64, seed=3)
    mesh = mesh_mod.make_mesh((8,), ("points",))
    order = jnp.argsort(problem.obs_pt, stable=True)
    Pn = problem.points.shape[0]
    shard_sz = Pn // 8
    obs_pt_sorted = problem.obs_pt[order]
    problem_sharded = problem._replace(
        obs_kf=problem.obs_kf[order],
        obs_pt=obs_pt_sorted % shard_sz,
        obs_uv=problem.obs_uv[order],
        obs_mask=problem.obs_mask[order],
    )
    ref = ba.solve_point_sharded(problem_sharded, mesh, assembly="psum")
    ring = ba.solve_point_sharded(problem_sharded, mesh, assembly="ring")
    np.testing.assert_allclose(
        np.asarray(ring.poses.t), np.asarray(ref.poses.t), atol=5e-4
    )
    np.testing.assert_allclose(
        float(ring.energy), float(ref.energy), rtol=0.1, atol=1e-6
    )


def test_ba_ring_requires_divisible_K():
    from tests.test_ba import make_problem

    problem, _, _ = make_problem(K=3, P=64, seed=4)
    mesh = mesh_mod.make_mesh((8,), ("points",))
    with pytest.raises(ValueError):
        ba.solve_point_sharded(problem, mesh, assembly="ring")

"""Pose-graph optimization (loop closure back-end).

The reference explicitly defers loop closure and pose-graph optimization to
future work (reference README.md:54-55); this is the green-field
implementation: given node poses ``T_i`` and relative measurements ``Z_ij``
(odometry chains + loop-closure edges), minimize

    E = Σ_edges || log( Z_ij^-1 · T_i^-1 · T_j ) ||²_Λ

over right-multiplied twist updates ``T_i <- T_i exp(xi_i)``.

TPU-first design: residuals and their (6, 2x6) Jacobians per edge come from
forward-mode autodiff of the exact se3 residual (vmapped over a fixed-shape
edge array — autodiff through the ``jnp.where``-guarded Taylor branches is
well-defined), the normal equations are assembled with segment-sums, and the
damped 6N x 6N system is solved with Cholesky inside a ``lax.while_loop`` LM
driver.  Node 0 is gauge-fixed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math import pose as pose_mod
from ..math import se3
from ..math.pose import Pose
from ..utils.types import Float


class PoseGraph(NamedTuple):
    """Fixed-shape pose graph.

    nodes: Pose with leading (N,).
    edge_i / edge_j: (E,) int32 endpoints.
    edge_z: Pose with leading (E,) — measured T_i^-1 T_j.
    edge_weight: (E,) f32 — information weight per edge (0 = padding).
    """

    nodes: Pose
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_z: Pose
    edge_weight: jnp.ndarray


def edge_residual(ti: Pose, tj: Pose, z: Pose) -> jnp.ndarray:
    """6-dim se3 residual of one edge: log(Z^-1 T_i^-1 T_j)."""
    rel = pose_mod.compose(pose_mod.inverse(ti), tj)
    err = pose_mod.compose(pose_mod.inverse(z), rel)
    return se3.log(err)


def residuals(graph: PoseGraph, nodes: Pose) -> jnp.ndarray:
    ti = jax.tree_util.tree_map(lambda v: v[graph.edge_i], nodes)
    tj = jax.tree_util.tree_map(lambda v: v[graph.edge_j], nodes)
    r = jax.vmap(edge_residual)(ti, tj, graph.edge_z)
    return r * jnp.sqrt(graph.edge_weight)[:, None]


def _edge_jacobians(graph: PoseGraph, nodes: Pose):
    """Per-edge residual + Jacobians wrt both endpoint twists, (E,6,6) each."""

    def r_one(xi_i, xi_j, qi, ti_, qj, tj_, zq, zt, wgt):
        ti = pose_mod.compose(Pose(qi, ti_), se3.exp(xi_i))
        tj = pose_mod.compose(Pose(qj, tj_), se3.exp(xi_j))
        return edge_residual(ti, tj, Pose(zq, zt)) * jnp.sqrt(wgt)

    zeros6 = jnp.zeros(6, Float)

    def jac_one(qi, ti_, qj, tj_, zq, zt, wgt):
        ji = jax.jacfwd(lambda xi: r_one(xi, zeros6, qi, ti_, qj, tj_, zq, zt, wgt))(zeros6)
        jj = jax.jacfwd(lambda xj: r_one(zeros6, xj, qi, ti_, qj, tj_, zq, zt, wgt))(zeros6)
        r = r_one(zeros6, zeros6, qi, ti_, qj, tj_, zq, zt, wgt)
        return ji, jj, r

    qi = nodes.q[graph.edge_i]
    ti = nodes.t[graph.edge_i]
    qj = nodes.q[graph.edge_j]
    tj = nodes.t[graph.edge_j]
    return jax.vmap(jac_one)(qi, ti, qj, tj, graph.edge_z.q, graph.edge_z.t, graph.edge_weight)


class PGOResult(NamedTuple):
    nodes: Pose
    energy: jnp.ndarray
    nb_iter: jnp.ndarray


@partial(jax.jit, static_argnames=("max_iterations",))
def solve(graph: PoseGraph, *, max_iterations: int = 20) -> PGOResult:
    """LM pose-graph optimization; node 0 gauge-fixed."""
    N = graph.nodes.q.shape[0]

    def energy_of(nodes):
        r = residuals(graph, nodes)
        return jnp.sum(r * r)

    def normal_equations(nodes):
        ji, jj, r = _edge_jacobians(graph, nodes)
        # H is (N,6,N,6) assembled from the four per-edge blocks.
        H = jnp.zeros((N, 6, N, 6), Float)
        Hii = jnp.einsum("eab,eac->ebc", ji, ji)
        Hjj = jnp.einsum("eab,eac->ebc", jj, jj)
        Hij = jnp.einsum("eab,eac->ebc", ji, jj)
        H = H.at[graph.edge_i, :, graph.edge_i, :].add(Hii)
        H = H.at[graph.edge_j, :, graph.edge_j, :].add(Hjj)
        H = H.at[graph.edge_i, :, graph.edge_j, :].add(Hij)
        H = H.at[graph.edge_j, :, graph.edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
        g = jnp.zeros((N, 6), Float)
        g = g.at[graph.edge_i].add(-jnp.einsum("eab,ea->eb", ji, r))
        g = g.at[graph.edge_j].add(-jnp.einsum("eab,ea->eb", jj, r))
        return H.reshape(6 * N, 6 * N), g.reshape(6 * N)

    def body(carry):
        nodes, energy, lm, it, done = carry
        H, g = normal_equations(nodes)
        n = 6 * N
        idx = jnp.arange(n)
        free = idx >= 6  # gauge-fix node 0
        eye = jnp.eye(n, dtype=Float)
        H_damped = H * (1.0 + lm * eye) + 1e-8 * eye
        H_fixed = jnp.where(free[:, None] & free[None, :], H_damped, eye)
        g_fixed = jnp.where(free, g, 0.0)
        chol = jnp.linalg.cholesky(H_fixed)
        delta = jax.scipy.linalg.cho_solve((chol, True), g_fixed).reshape(N, 6)
        new_nodes = jax.vmap(lambda q, t, xi: pose_mod.compose(Pose(q, t), se3.exp(xi)))(
            nodes.q, nodes.t, delta
        )
        new_nodes = pose_mod.renormalize_first_order(Pose(new_nodes.q, new_nodes.t))
        new_energy = energy_of(new_nodes)
        ok = (
            jnp.isfinite(new_energy)
            & (new_energy <= energy)
            & jnp.all(jnp.isfinite(new_nodes.q))
            & jnp.all(jnp.isfinite(new_nodes.t))
        )
        nodes = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_nodes, nodes
        )
        lm = jnp.where(ok, lm * 0.3, lm * 10.0)
        d_energy = energy - new_energy
        done = jnp.logical_or(
            it + 1 >= max_iterations,
            jnp.logical_and(ok, d_energy < 1e-9 * (energy + 1.0)),
        )
        energy = jnp.where(ok, new_energy, energy)
        return nodes, energy, lm, it + 1, done

    energy0 = energy_of(graph.nodes)
    nodes, energy, _, it, _ = jax.lax.while_loop(
        lambda c: ~c[-1],
        body,
        (graph.nodes, energy0, jnp.asarray(1e-6, Float), jnp.asarray(0, jnp.int32), jnp.asarray(False)),
    )
    return PGOResult(nodes=nodes, energy=energy, nb_iter=it)


def odometry_graph(nodes: Pose, loop_edges=(), noise_weight: float = 1.0) -> PoseGraph:
    """Build a chain pose graph from a trajectory plus optional loop edges.

    ``loop_edges`` is an iterable of (i, j, Pose) measured relative motions
    (e.g. from ``models.loop_closure.detect_loops``).

    CAVEAT: chain measurements are taken from the consecutive node
    *estimates*, so every chain edge has zero residual at initialization —
    all correction signal comes from the loop edges, which the optimizer
    distributes around the loop.  This is the right structure when the
    estimates ARE the odometry (the usual case); if you have independent
    odometry measurements with their own noise, build the ``PoseGraph``
    directly with those as ``edge_z`` instead.
    """
    N = nodes.q.shape[0]
    ii = [i for i in range(N - 1)]
    jj = [i + 1 for i in range(N - 1)]
    zq, zt, ww = [], [], []
    for i in range(N - 1):
        ti = Pose(nodes.q[i], nodes.t[i])
        tj = Pose(nodes.q[i + 1], nodes.t[i + 1])
        z = pose_mod.compose(pose_mod.inverse(ti), tj)
        zq.append(z.q)
        zt.append(z.t)
        ww.append(noise_weight)
    for (i, j, z) in loop_edges:
        ii.append(i)
        jj.append(j)
        zq.append(z.q)
        zt.append(z.t)
        ww.append(noise_weight)
    return PoseGraph(
        nodes=nodes,
        edge_i=jnp.asarray(ii, jnp.int32),
        edge_j=jnp.asarray(jj, jnp.int32),
        edge_z=Pose(jnp.stack(zq), jnp.stack(zt)),
        edge_weight=jnp.asarray(ww, Float),
    )

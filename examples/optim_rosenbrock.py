"""LM on the Rosenbrock function through the generic optimizer harness.

Mirrors reference ``examples/optim_rosenbrock.rs``: residuals
``r1 = (a-x)^2``, ``r2 = b (y - x^2)^2`` with a=1, b=100; LM from (-2, -2);
stop at d_energy <= 1e-10 or 100 iterations.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp

from visual_odometry_rs_tpu.math.optimizer import (
    LMState, damped_solve, iterative_solve, lm_update,
)

A, B = 1.0, 100.0


def res(m):
    x, y = m[0], m[1]
    return jnp.stack([(A - x) ** 2, B * (y - x * x) ** 2])


def jac(m):
    x, y = m[0], m[1]
    return jnp.array(
        [[-2.0 * (A - x), 0.0], [-4.0 * B * x * (y - x * x), 2.0 * B * (y - x * x)]]
    )


def evaluate(m):
    r = res(m)
    j = jac(m)
    return jnp.sum(r * r), j.T @ r, j.T @ j


def main():
    result = iterative_solve(
        None,
        jnp.array([-2.0, -2.0], jnp.float32),
        init=lambda o, m: LMState(m, *evaluate(m), jnp.float32(0.1)),
        step=lambda s: s.model - damped_solve(s.hessian, s.gradient, s.lm_coef),
        eval_fn=lambda o, s, m: (m, *evaluate(m)),
        stop_criterion=lambda s, n, e: lm_update(
            s, n, *e, max_iterations=99, energy_tol=1e-10
        ),
        max_iterations=150,
    )
    print(f"After {int(result.nb_iter)} iterations:")
    print(f"Computed: {tuple(float(v) for v in result.state.model)}")
    print("Solution: (1.0, 1.0)")


if __name__ == "__main__":
    main()

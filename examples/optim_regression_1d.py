"""LM fit of ``y = exp(-a x)`` on 100 noisy points (seeded).

Mirrors reference ``examples/optim_regression-1d.rs`` with ground truth
a = 1.5, uniform noise in [-0.1, 0.1], scalar gradient/Hessian.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from visual_odometry_rs_tpu.math.optimizer import (
    LMState, damped_solve, iterative_solve, lm_update,
)


def main():
    a_truth = 1.5
    nb = 100
    x = jnp.linspace(-5.0, 3.0, nb)
    noise = jax.random.uniform(jax.random.PRNGKey(0), (nb,), minval=-1.0, maxval=1.0)
    y = jnp.exp(-a_truth * x) + 0.1 * noise

    def evaluate(a):
        f = jnp.exp(-a * x)
        r = f - y
        energy = jnp.sum(r * r) / nb
        j = -f * x
        return energy, jnp.dot(j, r).reshape(1), jnp.dot(j, j).reshape(1, 1)

    result = iterative_solve(
        None,
        jnp.float32(0.0),
        init=lambda o, m: LMState(m, *evaluate(m), jnp.float32(0.1)),
        step=lambda s: s.model - damped_solve(s.hessian, s.gradient, s.lm_coef)[0],
        eval_fn=lambda o, s, m: (m, *evaluate(m)),
        stop_criterion=lambda s, n, e: lm_update(
            s, n, *e, max_iterations=50, energy_tol=1e-8
        ),
        max_iterations=80,
    )
    print(f"After {int(result.nb_iter)} iterations:")
    print(f"Ground truth: a = {a_truth}")
    print(f"Computed:     a = {float(result.state.model)}")


if __name__ == "__main__":
    main()

"""LM optimizer harness tests.

Asserted versions of the reference's self-checking examples:
- Rosenbrock (``examples/optim_rosenbrock.rs``): converge to (1, 1).
- 1D regression ``y = exp(-a x)`` (``examples/optim_regression-1d.rs``):
  recover a ≈ 1.5 from noisy data (seeded).
"""

import jax
import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.math.optimizer import (
    LMState,
    damped_solve,
    iterative_solve,
    lm_update,
)

A = 1.0
B = 100.0


def rosenbrock_res(m):
    x, y = m[0], m[1]
    return jnp.stack([(A - x) ** 2, B * (y - x * x) ** 2])


def rosenbrock_jac(m):
    x, y = m[0], m[1]
    return jnp.array(
        [
            [-2.0 * (A - x), 0.0],
            [-4.0 * B * x * (y - x * x), 2.0 * B * (y - x * x)],
        ]
    )


def _rosenbrock_eval(model):
    r = rosenbrock_res(model)
    jac = rosenbrock_jac(model)
    energy = jnp.sum(r * r)
    grad = jac.T @ r
    hess = jac.T @ jac
    return energy, grad, hess


def solve_rosenbrock(initial):
    def init(obs, model):
        energy, grad, hess = _rosenbrock_eval(model)
        return LMState(model, energy, grad, hess, jnp.float32(0.1))

    def step(state):
        delta = damped_solve(state.hessian, state.gradient, state.lm_coef)
        return state.model - delta

    def eval_fn(obs, state, new_model):
        energy, grad, hess = _rosenbrock_eval(new_model)
        return (new_model, energy, grad, hess)

    def stop(state, nb_iter, eval_out):
        # ref example: >= 100 iterations cap, d_energy stop at 1e-10
        new_model, energy, grad, hess = eval_out
        return lm_update(
            state, nb_iter, new_model, energy, grad, hess,
            max_iterations=99, energy_tol=1e-10,
        )

    return iterative_solve(
        None,
        jnp.asarray(initial, jnp.float32),
        init=init,
        step=step,
        eval_fn=eval_fn,
        stop_criterion=stop,
        max_iterations=200,
    )


def test_rosenbrock_converges():
    result = jax.jit(solve_rosenbrock)(jnp.array([-2.0, -2.0]))
    model = np.asarray(result.state.model)
    assert not bool(result.failed)
    np.testing.assert_allclose(model, [1.0, 1.0], atol=5e-3)


def test_rosenbrock_from_other_starts():
    # (0, 0) is excluded: the Gauss-Newton Hessian there is singular, which
    # fails the Cholesky step in the reference formulation as well.
    for start in ([2.0, 2.0], [-1.2, 1.0], [0.5, -0.5]):
        result = solve_rosenbrock(jnp.array(start))
        model = np.asarray(result.state.model)
        np.testing.assert_allclose(model, [1.0, 1.0], atol=5e-3)


# ---------------------------------------------------------------------------
# regression 1d: y = exp(-a x)
# ---------------------------------------------------------------------------


def test_regression_1d():
    a_truth = 1.5
    nb = 100
    x = jnp.linspace(-5.0, 3.0, nb)
    key = jax.random.PRNGKey(42)
    noise = jax.random.uniform(key, (nb,), minval=-1.0, maxval=1.0)
    y = jnp.exp(-a_truth * x) + 0.1 * noise
    obs = (x, y)

    def eval_model(obs, model):
        x, y = obs
        f = jnp.exp(-model * x)
        r = f - y
        energy = jnp.sum(r * r) / nb
        jac = -f * x
        grad = jnp.dot(jac, r)
        hess = jnp.dot(jac, jac)
        return energy, grad, hess

    def init(obs, model):
        energy, grad, hess = eval_model(obs, model)
        return LMState(
            model, energy, grad.reshape(1), hess.reshape(1, 1), jnp.float32(0.1)
        )

    def step(state):
        delta = damped_solve(state.hessian, state.gradient, state.lm_coef)
        return state.model - delta[0]

    def eval_fn(obs, state, new_model):
        energy, grad, hess = eval_model(obs, new_model)
        return (new_model, energy, grad, hess)

    def stop(state, nb_iter, eval_out):
        new_model, energy, grad, hess = eval_out
        return lm_update(
            state, nb_iter, new_model, energy,
            grad.reshape(1), hess.reshape(1, 1),
            max_iterations=50, energy_tol=1e-8,
        )

    result = iterative_solve(
        obs, jnp.float32(0.0),
        init=init, step=step, eval_fn=eval_fn, stop_criterion=stop,
        max_iterations=100,
    )
    a = float(result.state.model)
    assert abs(a - a_truth) < 0.05, a


def test_failed_cholesky_reports_failure():
    # A zero Hessian makes the damped system singular -> NaN delta -> failed.
    def init(obs, model):
        return LMState(
            model, jnp.float32(1.0),
            jnp.ones(2, jnp.float32), jnp.zeros((2, 2), jnp.float32),
            jnp.float32(0.1),
        )

    def step(state):
        return state.model - damped_solve(state.hessian, state.gradient, state.lm_coef)

    def eval_fn(obs, state, new_model):
        return (new_model, jnp.float32(0.5))

    def stop(state, nb_iter, eval_out):
        new_model, energy = eval_out
        return state._replace(model=new_model, energy=energy), jnp.asarray(False)

    result = iterative_solve(
        None, jnp.zeros(2, jnp.float32),
        init=init, step=step, eval_fn=eval_fn, stop_criterion=stop,
        max_iterations=10,
    )
    assert bool(result.failed)
    # state untouched by the failing step
    np.testing.assert_array_equal(np.asarray(result.state.model), np.zeros(2))


def test_lm_rejection_increases_lambda():
    # Force an energy increase and check λ *= 10 semantics + continuation.
    state = LMState(
        jnp.zeros(2), jnp.float32(1.0), jnp.zeros(2), jnp.eye(2), jnp.float32(0.1)
    )
    new_state, cont = lm_update(
        state, jnp.int32(1), jnp.ones(2), jnp.float32(2.0),
        jnp.zeros(2), jnp.eye(2), max_iterations=20, energy_tol=1.0,
    )
    assert float(new_state.lm_coef) == np.float32(1.0)  # 0.1 * 10
    np.testing.assert_array_equal(np.asarray(new_state.model), np.zeros(2))  # kept
    assert bool(cont)

    # Acceptance: λ *= 0.1, model adopted, stop when d_energy <= tol.
    new_state, cont = lm_update(
        state, jnp.int32(1), jnp.ones(2), jnp.float32(0.5),
        jnp.zeros(2), jnp.eye(2), max_iterations=20, energy_tol=1.0,
    )
    np.testing.assert_allclose(float(new_state.lm_coef), 0.01, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(new_state.model), np.ones(2))
    assert not bool(cont)  # d_energy = 0.5 <= 1.0


def test_failure_flag_on_singular_hessian():
    """(0,0): singular GN Hessian -> Cholesky fails; the loop must exit with
    failed=True and leave the model untouched (the reference's graceful
    degradation path, inverse_compositional.rs:195-199)."""
    result = solve_rosenbrock(jnp.array([0.0, 0.0]))
    assert bool(result.failed)
    np.testing.assert_allclose(np.asarray(result.state.model), [0.0, 0.0], atol=1e-7)

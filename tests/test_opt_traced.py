"""conjugate_gradient_traced must match the host-control-flow CG exactly.

The lamino solvers fused their outer iterations into single programs
(round 5); these tests pin the traced line search / CG loop to the
host-side reference implementation (`opt.line_search`/`conjugate_gradient`)
on problems small enough to compare trajectories step by step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tike_tpu.opt import (
    conjugate_gradient,
    conjugate_gradient_traced,
    line_search,
    line_search_traced,
)


def _quadratic(seed=0, n=12):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = A @ A.T / n + 0.5 * np.eye(n, dtype=np.float32)
    b = rng.standard_normal(n).astype(np.float32)

    def cost(x):
        return 0.5 * jnp.vdot(x, A @ x).real - jnp.vdot(b, x).real

    def grad(x):
        return A @ x - b

    x0 = rng.standard_normal(n).astype(np.float32)
    return cost, grad, x0


@pytest.mark.parametrize("step0", [1.0, 0.3, 1e-4])
def test_line_search_traced_matches_host(step0):
    cost, grad, x0 = _quadratic(1)
    x = jnp.asarray(x0)
    d = -grad(x)
    c0 = float(cost(x))

    s_host, f_host, x_host = line_search(
        f=lambda v: float(cost(v)),
        x=x,
        d=d,
        update_multi=lambda x, g, d: x + g * d,
        step_length=step0,
    )
    s_tr, f_tr, x_tr = jax.jit(
        lambda x, d: line_search_traced(cost, x, d, step0, jnp.float32(c0))
    )(x, d)
    np.testing.assert_allclose(float(s_tr), s_host, rtol=1e-6)
    np.testing.assert_allclose(float(f_tr), f_host, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x_tr), np.asarray(x_host),
                               rtol=1e-5, atol=1e-6)


def test_line_search_traced_total_failure_keeps_x():
    """An ascent direction fails every backtrack: step 0, x unchanged,
    cost unchanged — the host 'else' branch."""
    cost, grad, x0 = _quadratic(2)
    x = jnp.asarray(x0)
    d = grad(x)  # ascent direction
    c0 = float(cost(x))
    s, f, x_new = jax.jit(
        lambda x, d: line_search_traced(cost, x, d, 1.0, jnp.float32(c0))
    )(x, d)
    assert float(s) == 0.0
    np.testing.assert_allclose(float(f), c0, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(x_new), np.asarray(x))


def test_conjugate_gradient_traced_matches_host():
    cost, grad, x0 = _quadratic(3)
    x = jnp.asarray(x0)

    x_host, c_host = conjugate_gradient(
        None,
        x=x,
        cost_function=lambda v: float(cost(v)),
        grad=grad,
        num_iter=4,
        step_length=1.0,
    )
    x_tr, c_tr, _ = jax.jit(
        lambda x: conjugate_gradient_traced(
            x, cost, grad, num_iter=4, step_length=1.0
        )
    )(x)
    np.testing.assert_allclose(float(c_tr), float(c_host), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(x_tr), np.asarray(x_host), rtol=1e-4, atol=1e-5
    )
    # And it actually minimizes.
    assert float(c_tr) < float(cost(x))


def test_conjugate_gradient_traced_complex():
    """Complex volumes (the lamino case): trajectory matches the host."""
    rng = np.random.default_rng(4)
    n = 8
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = (A @ A.conj().T / n + 0.5 * np.eye(n)).astype(np.complex64)
    b = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )

    def cost(x):
        return (0.5 * jnp.vdot(x, A @ x) - jnp.vdot(b, x)).real

    def grad(x):
        return A @ x - b

    x0 = jnp.asarray(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
    )
    x_host, c_host = conjugate_gradient(
        None,
        x=x0,
        cost_function=lambda v: float(cost(v)),
        grad=grad,
        num_iter=3,
        step_length=0.7,
    )
    x_tr, c_tr, _ = jax.jit(
        lambda x: conjugate_gradient_traced(
            x, cost, grad, num_iter=3, step_length=0.7
        )
    )(x0)
    np.testing.assert_allclose(float(c_tr), float(c_host), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(x_tr), np.asarray(x_host), rtol=1e-4, atol=1e-5
    )

"""CGLS laminography solver: quality and optimality vs the cgrad baseline.

The lamino forward model is linear, so CGLS (one fwd + one adj per step,
optimal step lengths; `opt.cgls_traced`) must converge at least as well as
the generic backtracking CG at equal iteration counts — these tests pin
that, plus agreement with the reference's pinned golden reconstruction.
"""

import lzma
import os
import pickle

import numpy as np
import pytest

import tike_tpu.lamino

LOCAL_DATA = os.path.join(os.path.dirname(__file__), "data")
REF_DATA = "/root/reference/tests/data"


def _problem(n=24, ntheta=8, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx, zz = np.mgrid[0:n, 0:n, 0:n] / n - 0.5
    obj = (
        np.exp(-((yy**2 + xx**2 + zz**2) / 0.08))
        * (1 + 0.3j * np.cos(7 * xx))
    ).astype(np.complex64)
    theta = np.linspace(0, 2 * np.pi, ntheta, endpoint=False).astype(
        np.float32
    )
    tilt = np.pi / 3
    data = tike_tpu.lamino.simulate(obj, theta, tilt, eps=1e-3)
    return obj, theta, tilt, data


def test_lamino_adj_exact_is_adjoint_at_critical_sampling():
    """At upsample=1 the conventional -xi adjoint drifts ~20% from true
    adjointness (Nyquist-row aliasing of the even grid); lamino_adj_exact
    must satisfy <Au, d> == <u, A*d> to float precision there."""
    import jax.numpy as jnp

    from tike_tpu.ops.lamino import (
        LaminoConfig,
        lamino_adj,
        lamino_adj_exact,
        lamino_fwd,
    )

    rng = np.random.default_rng(3)
    n, ntheta = 24, 8
    theta = jnp.asarray(
        np.linspace(0, 2 * np.pi, ntheta, endpoint=False).astype(np.float32)
    )
    u = jnp.asarray(
        (rng.standard_normal((n, n, n)) + 1j * rng.standard_normal((n, n, n)))
        .astype(np.complex64)
    )
    d = jnp.asarray(
        (
            rng.standard_normal((ntheta, n, n))
            + 1j * rng.standard_normal((ntheta, n, n))
        ).astype(np.complex64)
    )
    for kernel in ("kb", "gaussian"):
        cfg = LaminoConfig(
            n=n, tilt=float(np.pi / 3), eps=1e-3, upsample=1.0, kernel=kernel
        )
        a = np.vdot(np.asarray(lamino_fwd(cfg, u, theta)), np.asarray(d))
        b = np.vdot(np.asarray(u), np.asarray(lamino_adj_exact(cfg, d, theta)))
        np.testing.assert_allclose(a, b, rtol=1e-4)
    # And document the drift the exact adjoint fixes: the -xi identity is
    # measurably NOT adjoint at this setting.
    cfg = LaminoConfig(n=n, tilt=float(np.pi / 3), eps=1e-3, upsample=1.0)
    b_approx = np.vdot(
        np.asarray(u), np.asarray(lamino_adj(cfg, d, theta))
    )
    a = np.vdot(np.asarray(lamino_fwd(cfg, u, theta)), np.asarray(d))
    assert abs(a / b_approx - 1) > 0.05


def test_cgls_converges_and_beats_cgrad_at_equal_iterations():
    obj, theta, tilt, data = _problem()
    kwargs = dict(data=data, theta=theta, tilt=tilt, num_iter=4, cg_iter=4,
                  eps=1e-3)
    r_cgls = tike_tpu.lamino.reconstruct(algorithm="cgls", **kwargs)
    r_cgrad = tike_tpu.lamino.reconstruct(algorithm="cgrad", **kwargs)
    assert np.all(np.isfinite(r_cgls["cost"]))
    # Monotone decrease (exact line search cannot increase the cost).
    assert np.all(np.diff(r_cgls["cost"]) <= 1e-3 * r_cgls["cost"][0])
    # At equal fwd/adj budget CGLS reaches at least as low a cost.
    assert r_cgls["cost"][-1] <= r_cgrad["cost"][-1] * 1.05
    # And reconstructs the same object.
    a, b = r_cgls["obj"], r_cgrad["obj"]
    corr = np.abs(np.vdot(a, b)) / (
        np.linalg.norm(a) * np.linalg.norm(b) + 1e-12
    )
    assert corr > 0.95, corr


@pytest.mark.slow
@pytest.mark.skipif(
    not (
        os.path.isfile(os.path.join(LOCAL_DATA, "lamino_setup.pickle.lzma"))
        or os.path.isfile(os.path.join(REF_DATA, "lamino_setup.pickle.lzma"))
    ),
    reason="golden dataset unavailable",
)
def test_cgls_matches_reference_golden_reconstruction():
    """CGLS converges to the same solution the reference pinned for its
    backtracking CG (both stay in range(A*) from a zero init, where the
    LS minimizer is unique), within the reference's own atol=1e-3."""

    def _load(name):
        path = os.path.join(LOCAL_DATA, name)
        if not os.path.isfile(path):
            path = os.path.join(REF_DATA, name)
        with lzma.open(path, "rb") as f:
            return pickle.load(f)

    data, original, theta, tilt = _load("lamino_setup.pickle.lzma")
    standard = _load("lamino_cgrad.pickle.lzma")
    r = tike_tpu.lamino.reconstruct(
        data, theta, tilt, obj=np.zeros_like(original),
        algorithm="cgls", num_iter=8, cg_iter=4, eps=1e-3,
    )
    np.testing.assert_allclose(np.asarray(r["obj"]), standard, atol=1e-3)

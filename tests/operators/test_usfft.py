"""USFFT tests against a direct nonuniform DFT oracle.

Mirrors the reference strategy (`tests/operators/test_usfft.py`): the CUDA
gather/scatter were validated against numpy `vector_gather/vector_scatter`;
here we validate eq2us against the exact O(N n^3) direct transform on a small
grid, and gather/scatter adjointness.
"""

import numpy as np
import jax.numpy as jnp

from tike_tpu.ops.usfft import (
    checkerboard,
    eq2us,
    gather,
    gather_kb,
    gather_kb_rows,
    kb_parameters,
    scatter,
    scatter_kb,
    scatter_kb_rows,
    us2eq,
    usfft_parameters,
)
from .util import random_complex, check_adjoint

N_GRID = 16
N_PTS = 77


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    f = random_complex(rng, N_GRID, N_GRID, N_GRID)
    x = (rng.random((N_PTS, 3)) - 0.5).astype(np.float32) * 0.98
    return f, x


def _direct_eq2us(f, x, n):
    """Exact nonuniform DFT: F(x) = sum_k f[k] exp(-2 pi i x . k)."""
    k = np.arange(n) - n // 2
    k0, k1, k2 = np.meshgrid(k, k, k, indexing="ij")
    F = np.zeros(len(x), dtype=np.complex128)
    for i, xi in enumerate(x):
        phase = np.exp(
            -2j * np.pi * (xi[0] * k0 + xi[1] * k1 + xi[2] * k2)
        )
        F[i] = np.sum(f * phase)
    return F


def test_eq2us_matches_direct_dft():
    f, x = _setup()
    want = _direct_eq2us(f, x, N_GRID)
    got = np.asarray(eq2us(jnp.asarray(f), jnp.asarray(x), N_GRID, 1e-6, 2))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3 * np.abs(want).max())


def test_eq2us_gaussian_matches_direct_dft():
    """The reference's Gaussian window stays as a cross-check oracle."""
    f, x = _setup()
    want = _direct_eq2us(f, x, N_GRID)
    got = np.asarray(
        eq2us(jnp.asarray(f), jnp.asarray(x), N_GRID, 1e-6, 2, "gaussian")
    )
    np.testing.assert_allclose(
        got, want, rtol=1e-3, atol=1e-3 * np.abs(want).max()
    )


def test_kb_matches_gaussian():
    """KB and Gaussian windows agree to the requested eps."""
    f, x = _setup()
    a = np.asarray(eq2us(jnp.asarray(f), jnp.asarray(x), N_GRID, 1e-6, 2, "kb"))
    b = np.asarray(
        eq2us(jnp.asarray(f), jnp.asarray(x), N_GRID, 1e-6, 2, "gaussian")
    )
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4 * np.abs(b).max())


def test_kb_tighter_eps_is_more_accurate():
    """Accuracy tracks the eps knob (the reference's accuracy contract)."""
    f, x = _setup()
    want = _direct_eq2us(f, x, N_GRID)
    scale = np.abs(want).max()
    errs = []
    for eps in (1e-2, 1e-4, 1e-6):
        got = np.asarray(
            eq2us(jnp.asarray(f), jnp.asarray(x), N_GRID, eps, 2, "kb")
        )
        errs.append(np.abs(got - want).max() / scale)
    assert errs[0] > errs[2], errs
    assert errs[2] < 1e-5, errs


def test_kb_gather_scatter_adjoint():
    f, x = _setup()
    upsampled, pad, m, beta = kb_parameters(N_GRID, 1e-6, 2)
    rng = np.random.default_rng(1)
    Fe = random_complex(rng, upsampled, upsampled, upsampled)
    vals = random_complex(rng, N_PTS)
    g = gather_kb(jnp.asarray(Fe), jnp.asarray(x), upsampled, m, beta)
    s = scatter_kb(jnp.asarray(vals), jnp.asarray(x), upsampled, m, beta)
    check_adjoint(g, Fe, s, vals, rtol=1e-3)


def test_kb_fewer_taps_than_gaussian():
    """The point of the KB window: ~8x fewer (2m)^3 taps at equal eps."""
    for eps in (1e-3, 1e-6):
        _, _, _, m_gauss = usfft_parameters(N_GRID, eps, 2)
        _, _, m_kb, _ = kb_parameters(N_GRID, eps, 2)
        assert (2 * m_kb) ** 3 <= (2 * m_gauss) ** 3 / 4, (m_kb, m_gauss)


def test_kb_beats_gaussian_at_critical_sampling():
    """At upsample=1 (the reference Lamino default) the minimal 2-point KB
    window is BOTH cheaper (8 taps vs 64) and more accurate than the
    reference's Gaussian — pins the measured 0.47-vs-0.94 relerr claim
    (aliasing-limited regime; both are inaccurate in absolute terms)."""
    f, x = _setup()
    want = _direct_eq2us(f, x, N_GRID)
    scale = np.abs(want).max()
    kb = np.asarray(eq2us(jnp.asarray(f), jnp.asarray(x), N_GRID, 1e-3, 1, "kb"))
    ga = np.asarray(
        eq2us(jnp.asarray(f), jnp.asarray(x), N_GRID, 1e-3, 1, "gaussian")
    )
    err_kb = np.abs(kb - want).max() / scale
    err_ga = np.abs(ga - want).max() / scale
    assert err_kb < err_ga, (err_kb, err_ga)
    _, _, m_kb, _ = kb_parameters(N_GRID, 1e-3, 1)
    _, _, _, m_ga = usfft_parameters(N_GRID, 1e-3, 1)
    assert (2 * m_kb) ** 3 < (2 * m_ga) ** 3, (m_kb, m_ga)


def _setup_rows(seed=4, R=11, C=9):
    """Row-structured points: x[..., 0] constant along the inner axis
    (the laminography tilted-plane grid property)."""
    rng = np.random.default_rng(seed)
    x = (rng.random((R, C, 3)) - 0.5).astype(np.float32) * 0.98
    x[..., 0] = x[:, :1, 0]  # constant along C
    return x


def test_kb_rows_matches_tap_scan():
    """gather/scatter_kb_rows compute the same sums as the tap-scan path."""
    rng = np.random.default_rng(5)
    upsampled, pad, m, beta = kb_parameters(N_GRID, 1e-6, 2)
    x = _setup_rows()
    Fe = random_complex(rng, upsampled, upsampled, upsampled)
    vals = random_complex(rng, *x.shape[:2])

    g_rows = np.asarray(
        gather_kb_rows(jnp.asarray(Fe), jnp.asarray(x), upsampled, m, beta)
    )
    g_scan = np.asarray(
        gather_kb(
            jnp.asarray(Fe), jnp.asarray(x.reshape(-1, 3)), upsampled, m,
            beta,
        )
    ).reshape(x.shape[:2])
    np.testing.assert_allclose(
        g_rows, g_scan, rtol=1e-4, atol=1e-4 * np.abs(g_scan).max()
    )

    s_rows = np.asarray(
        scatter_kb_rows(
            jnp.asarray(vals), jnp.asarray(x), upsampled, m, beta
        )
    )
    s_scan = np.asarray(
        scatter_kb(
            jnp.asarray(vals.reshape(-1)), jnp.asarray(x.reshape(-1, 3)),
            upsampled, m, beta,
        )
    )
    np.testing.assert_allclose(
        s_rows, s_scan, rtol=1e-4, atol=1e-4 * np.abs(s_scan).max()
    )


def test_kb_rows_gather_scatter_adjoint():
    rng = np.random.default_rng(6)
    upsampled, pad, m, beta = kb_parameters(N_GRID, 1e-6, 2)
    x = _setup_rows(R=13, C=7)
    Fe = random_complex(rng, upsampled, upsampled, upsampled)
    vals = random_complex(rng, *x.shape[:2])
    g = gather_kb_rows(jnp.asarray(Fe), jnp.asarray(x), upsampled, m, beta)
    s = scatter_kb_rows(jnp.asarray(vals), jnp.asarray(x), upsampled, m, beta)
    check_adjoint(g, Fe, s, vals, rtol=1e-3)


def test_eq2us_rows_layout_matches_flat():
    """eq2us/us2eq dispatch (R, C, 3) inputs onto the rows path with
    identical values to the flat-point path (both kernels)."""
    f, _ = _setup()
    x = _setup_rows(R=10, C=8)
    rng = np.random.default_rng(7)
    vals = random_complex(rng, 10, 8)
    for kernel in ("kb", "gaussian"):
        a = np.asarray(
            eq2us(jnp.asarray(f), jnp.asarray(x), N_GRID, 1e-6, 2, kernel)
        )
        b = np.asarray(
            eq2us(
                jnp.asarray(f), jnp.asarray(x.reshape(-1, 3)), N_GRID, 1e-6,
                2, kernel,
            )
        ).reshape(10, 8)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4 * np.abs(b).max())
        c = np.asarray(
            us2eq(jnp.asarray(vals), jnp.asarray(x), N_GRID, 1e-6, 2, kernel)
        )
        d = np.asarray(
            us2eq(
                jnp.asarray(vals.reshape(-1)), jnp.asarray(x.reshape(-1, 3)),
                N_GRID, 1e-6, 2, kernel,
            )
        )
        np.testing.assert_allclose(c, d, rtol=1e-4, atol=1e-4 * np.abs(d).max())


def test_gather_scatter_adjoint():
    f, x = _setup()
    upsampled, pad, mu, m = usfft_parameters(N_GRID, 1e-6, 2)
    rng = np.random.default_rng(1)
    Fe = random_complex(rng, upsampled, upsampled, upsampled)
    vals = random_complex(rng, N_PTS)
    g = gather(jnp.asarray(Fe), jnp.asarray(x), upsampled, m, mu)
    s = scatter(jnp.asarray(vals), jnp.asarray(x), upsampled, m, mu)
    check_adjoint(g, Fe, s, vals, rtol=1e-3)


def test_us2eq_adjoint_of_eq2us():
    """<eq2us(f), v> == <f, us2eq(v)> for matching grids and upsampling."""
    f, x = _setup()
    rng = np.random.default_rng(2)
    vals = random_complex(rng, N_PTS)
    F = eq2us(jnp.asarray(f), jnp.asarray(x), N_GRID, 1e-6, 2)
    # The adjoint of the exp(-2 pi i x k) synthesis is us2eq evaluated at the
    # negated frequencies (exactly how Lamino.adj calls it, `lamino.py:135`).
    G = us2eq(jnp.asarray(vals), jnp.asarray(-x), N_GRID, 1e-6, 2)
    check_adjoint(F, f, G, vals, rtol=1e-3)


def test_checkerboard_is_fftshift():
    rng = np.random.default_rng(3)
    a = random_complex(rng, 8, 8)
    # For even sizes: fft(checkerboard(x)) == checkerboard^-1 path equals
    # fftshift-based centered FFT.
    got = checkerboard(
        jnp.fft.fft2(checkerboard(jnp.asarray(a))), inverse=True
    )
    want = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(a)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

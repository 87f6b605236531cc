"""Unequally-spaced fast Fourier transforms (USFFT / NUFFT) in JAX.

TPU-native equivalent of `/root/reference/src/tike/operators/cupy/usfft.py`
plus its CUDA kernels (`usfft.cu:103-140`). The composition is identical —
zero-pad, Gaussian-kernel correction, FFT, and kernel interpolation — but the
gather/scatter between the uniform and non-uniform grids is expressed as a
`lax.scan` over the (2m)^3 kernel taps: each step is one batched gather (or
scatter-add) of all N non-uniform points, which XLA maps onto the TPU's
vectorized gather/scatter rather than one CUDA thread per point.

Frequency convention (same as the reference): uniform grids are
zero-centered, non-uniform frequencies x are in [-0.5, 0.5), and
eq2us(f)(x) ~ sum_k f[k] exp(-2 pi i x . k) with centered k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def usfft_parameters(n: int, eps: float, upsample: float = 1):
    """Return (upsampled, pad, mu, m): grid size, padding, kernel params."""
    upsampled = 2 * int(upsample * n / 2)
    pad = (upsampled - n) // 2
    mu = -np.log(eps) / (2 * n**2)
    Te = 1 / np.pi * np.sqrt(-mu * np.log(eps) + (mu * n) ** 2 / 4)
    m = int(np.ceil(upsampled * Te))
    return upsampled, pad, float(mu), m


def _get_kernel(n: int, mu: float, dtype=jnp.float32):
    """The separable Gaussian deapodization kernel (`usfft.py:46-57`)."""
    pad = n // 2
    end = n - pad
    u = -mu * jnp.arange(-pad, end, dtype=dtype) ** 2
    norm = u[None, None, :] + u[None, :, None] + u[:, None, None]
    return jnp.exp(norm)


def checkerboard(array, axes=None, inverse=False):
    """In-place-style FFT shift for even-sized grids via sign flips.

    Equivalent to the reference trick (`usfft.py:288-307`). Provided for API
    parity and tests; the transform pipeline below uses fftshift directly
    (XLA lowers it to a cheap roll).
    """
    axes = range(array.ndim) if axes is None else axes
    for i in axes:
        if array.shape[i] % 2 != 0:
            raise ValueError(
                "Can only use checkerboard algorithm for even dimensions. "
                f"This dimension is {array.shape[i]}."
            )
        n = array.shape[i]
        sign = 1 - 2 * (jnp.arange(n) % 2)
        shape = [1] * array.ndim
        shape[i] = n
        array = array * sign.reshape(shape)
        if inverse:
            array = array * (1 - 2 * ((n // 2) % 2))
    return array


def _tap_offsets(m: int):
    """All (2m)^3 integer offsets of the interpolation kernel."""
    r = np.arange(-m, m)
    i0, i1, i2 = np.meshgrid(r, r, r, indexing="ij")
    return np.stack(
        [i0.ravel(), i1.ravel(), i2.ravel()], axis=-1
    ).astype(np.int32)  # ((2m)^3, 3)


@functools.partial(jax.jit, static_argnames=("n", "m", "mu"))
def gather(Fe, x, n: int, m: int, mu: float):
    """Interpolate Fe (n,n,n) at non-uniform frequencies x (N,3) -> (N,).

    Equivalent of the CUDA `gather` kernel / `vector_gather` oracle
    (`usfft.py:60-96`): Gaussian-weighted sum over the (2m)^3 grid
    neighborhood of each point, with periodic wrapping.
    """
    cons0 = np.sqrt(np.pi / mu) ** 3
    cons1 = -np.pi**2 / mu
    half = n // 2
    ell = jnp.floor(n * x).astype(jnp.int32)  # (N, 3)
    # Complex gathers are unsupported/slow on some TPU backends; gather the
    # (re, im) float pair instead and recombine.
    Fe_flat = jnp.stack([Fe.real, Fe.imag], axis=-1).reshape(-1, 2)
    offsets = jnp.asarray(_tap_offsets(m))  # (T, 3)

    def body(acc, off):
        idx = ell + off[None, :]  # (N, 3)
        delta = jnp.sum((idx.astype(x.dtype) / n - x) ** 2, axis=-1)
        w = cons0 * jnp.exp(cons1 * delta)
        g = (half + idx) % n
        flat = (g[:, 0] * n + g[:, 1]) * n + g[:, 2]
        return acc + Fe_flat[flat] * w[:, None], None

    acc0 = jnp.zeros((x.shape[0], 2), dtype=Fe.real.dtype)
    acc, _ = jax.lax.scan(body, acc0, offsets)
    return jax.lax.complex(acc[:, 0], acc[:, 1]).astype(Fe.dtype)


@functools.partial(jax.jit, static_argnames=("n", "m", "mu"))
def scatter(f, x, n: int, m: int, mu: float):
    """Adjoint of :func:`gather`: spread f (N,) onto an (n,n,n) grid.

    Equivalent of the CUDA `scatter` kernel / `vector_scatter` oracle
    (`usfft.py:166-213`); the atomicAdd becomes a deterministic XLA
    scatter-add per kernel tap.
    """
    cons0 = np.sqrt(np.pi / mu) ** 3
    cons1 = -np.pi**2 / mu
    half = n // 2
    ell = jnp.floor(n * x).astype(jnp.int32)
    offsets = jnp.asarray(_tap_offsets(m))
    f2 = jnp.stack([f.real, f.imag], axis=-1)  # (N, 2) float

    def body(G, off):
        idx = ell + off[None, :]
        delta = jnp.sum((idx.astype(x.dtype) / n - x) ** 2, axis=-1)
        w = cons0 * jnp.exp(cons1 * delta)
        g = (half + idx) % n
        flat = (g[:, 0] * n + g[:, 1]) * n + g[:, 2]
        return G.at[flat].add(f2 * w[:, None]), None

    G0 = jnp.zeros((n * n * n, 2), dtype=f.real.dtype)
    G, _ = jax.lax.scan(body, G0, offsets)
    return jax.lax.complex(G[:, 0], G[:, 1]).astype(f.dtype).reshape(
        n, n, n
    )


# Aliases matching the reference's numpy test oracles.
def vector_gather(Fe, x, n, m, mu):
    return gather(Fe, x, n, m, mu)


def vector_scatter(f, x, n, m, mu):
    return scatter(f, x, n, m, mu)


@functools.partial(jax.jit, static_argnames=("n", "eps", "upsample"))
def eq2us(f, x, n: int, eps: float, upsample: float = 1):
    """USFFT from an equally-spaced grid to an unequally-spaced grid.

    f (n,n,n) complex; x (N,3) in [-0.5, 0.5). Mirrors `usfft.py:119-163`.
    """
    upsampled, pad, mu, m = usfft_parameters(n, eps, upsample)
    end = pad + n
    kernel = _get_kernel(n, mu, dtype=f.real.dtype) * upsampled**3

    fe = jnp.zeros((upsampled,) * 3, dtype=f.dtype)
    fe = fe.at[pad:end, pad:end, pad:end].set(f / kernel)
    # Centered FFT: equivalent to the double-checkerboard of the reference.
    # gather indexes with `half + ell`, i.e. it expects the centered layout.
    Fe = jnp.fft.fftshift(jnp.fft.fftn(jnp.fft.ifftshift(fe)))
    return gather(Fe, x, upsampled, m, mu)


@functools.partial(jax.jit, static_argnames=("n", "eps", "upsample"))
def us2eq(f, x, n: int, eps: float, upsample: float = 1):
    """USFFT from an unequally-spaced grid to an equally-spaced grid.

    f (N,) complex at frequencies x (N,3). Mirrors `usfft.py:236-280`.
    """
    upsampled, pad, mu, m = usfft_parameters(n, eps, upsample)
    end = pad + n
    kernel = _get_kernel(n, mu, dtype=f.real.dtype) * upsampled**3

    G = scatter(f, x, upsampled, m, mu)
    F = jnp.fft.fftshift(jnp.fft.fftn(jnp.fft.ifftshift(G)))
    return F[pad:end, pad:end, pad:end] / kernel

"""Free-space and Fresnel-spectrum wave propagation (JAX).

TPU-native equivalents of the reference operators:
- far-field propagation = ortho-normalized 2D FFT over the last two axes
  (`/root/reference/src/tike/operators/cupy/propagation.py:13-79`);
- Fresnel spectrum propagation between multislice planes
  (`fresnelspectprop.py:15-135`).

The reference caches cuFFT plans per shape (`cache.py:13-82`); under jit XLA
compiles and caches the FFT automatically, so no plan cache is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..precision import jcfloating


def propagation_fwd(nearplane: jax.Array) -> jax.Array:
    """Far-field propagation: batched ortho 2D FFT of the last two axes."""
    return jnp.fft.fft2(nearplane, axes=(-2, -1), norm="ortho")


def propagation_adj(farplane: jax.Array) -> jax.Array:
    """Adjoint far-field propagation: batched ortho 2D IFFT."""
    return jnp.fft.ifft2(farplane, axes=(-2, -1), norm="ortho")


@functools.partial(jax.jit, static_argnames=("shape",))
def fresnel_spectrum_propagator(
    shape: tuple[int, int],
    probe_FOV: tuple[float, float] = (1e-6, 1e-6),
    distance: float = 1e-6,
    wavelength: float = 1e-9,
) -> jax.Array:
    """Build the Fresnel spectrum transfer function H(Kx, Ky).

    H = exp(i * d * sqrt((2*pi/lambda)^2 - Kx^2 - Ky^2)), fftshifted so it can
    be applied directly to an unshifted FFT. Matches the reference grid
    construction (`fresnelspectprop.py:113-135`).
    """
    n0, n1 = shape
    xgrid = (0.5 + jnp.linspace(-0.5 * n1, 0.5 * n1 - 1, num=n1)) / n1
    ygrid = (0.5 + jnp.linspace(-0.5 * n0, 0.5 * n0 - 1, num=n0)) / n0
    kx = 2 * jnp.pi * n1 * xgrid / probe_FOV[1]
    ky = 2 * jnp.pi * n0 * ygrid / probe_FOV[0]
    Kx, Ky = jnp.meshgrid(kx, ky, indexing="xy")
    arg = (2 * jnp.pi / wavelength) ** 2 - Kx**2 - Ky**2
    # sqrt of possibly-negative argument -> evanescent waves decay; use
    # complex sqrt for correctness beyond the paraxial band.
    root = jnp.sqrt(arg.astype(jnp.complex64))
    h = jnp.exp(1j * distance * root)
    return jnp.fft.fftshift(h).astype(jcfloating)


def fresnel_fwd(nearplane: jax.Array, propagator: jax.Array) -> jax.Array:
    """Short-range Fresnel propagation: IFFT(H * FFT(x)) with ortho norm."""
    f = jnp.fft.fft2(nearplane, axes=(-2, -1), norm="ortho")
    return jnp.fft.ifft2(f * propagator, axes=(-2, -1), norm="ortho")


def fresnel_adj(farplane: jax.Array, propagator: jax.Array) -> jax.Array:
    """Adjoint Fresnel propagation: IFFT(conj(H) * FFT(x))."""
    f = jnp.fft.fft2(farplane, axes=(-2, -1), norm="ortho")
    return jnp.fft.ifft2(f * jnp.conj(propagator), axes=(-2, -1), norm="ortho")


@functools.lru_cache(maxsize=16)
def _dft_matrix(n: int, inverse: bool = False):
    """Cached ortho-normalized DFT matrix F with F @ x = fft(x, norm='ortho').

    Cached as a HOST (numpy) array: caching a jnp array here would capture a
    tracer when the first call happens inside a jit trace, poisoning every
    later call (UnexpectedTracerError). jnp.asarray at use turns it into a
    compile-time constant.
    """
    import numpy as np

    k = np.arange(n)
    sign = 2j if inverse else -2j
    return (
        np.exp(sign * np.pi * np.outer(k, k) / n) / np.sqrt(n)
    ).astype(np.complex64)


def matmul_fft2(x: jax.Array, inverse: bool = False) -> jax.Array:
    """Ortho 2D FFT of the last two axes computed as two MXU matmuls.

    On TPU, small fixed-size FFTs (e.g. 128^2 detectors) run faster as dense
    DFT-matrix products on the systolic array than through the generic FFT
    lowering: fft2(x) = F @ x @ F^T with F the (ortho) DFT matrix. Accuracy
    is float32-matmul-limited (~1e-5 relative for n <= 256).
    """
    fr = jnp.asarray(_dft_matrix(x.shape[-2], inverse))
    fc = jnp.asarray(_dft_matrix(x.shape[-1], inverse))
    y = jnp.einsum("km,...mn->...kn", fr, x)
    return jnp.einsum("...kn,ln->...kl", y, fc)


def propagation_fwd_matmul(nearplane: jax.Array) -> jax.Array:
    return matmul_fft2(nearplane, inverse=False)


def propagation_adj_matmul(farplane: jax.Array) -> jax.Array:
    return matmul_fft2(farplane, inverse=True)


# Solver-internal DFT-matmul path, opt-in via TIKE_MATMUL_FFT_MAX=<size>.
# Round-2 microbenchmarks measured the matmul variant 12% faster at 128²,
# but re-measured inside the production gradient program on the current
# relay toolchain it is ~50x SLOWER at (1000, 128, 128) and can hang the
# remote compiler — so the default is off (0). Accuracy when enabled is
# ~1e-5 relative; parity-critical surfaces (simulate, the operator API,
# cost oracles) always keep the exact FFT.
import os as _os

FAST_FFT_MAX_SIZE = int(_os.environ.get("TIKE_MATMUL_FFT_MAX", "0"))


def propagation_fwd_fast(nearplane: jax.Array) -> jax.Array:
    if (
        nearplane.shape[-1] <= FAST_FFT_MAX_SIZE
        and nearplane.shape[-2] <= FAST_FFT_MAX_SIZE
    ):
        return matmul_fft2(nearplane, inverse=False)
    return propagation_fwd(nearplane)


def propagation_adj_fast(farplane: jax.Array) -> jax.Array:
    if (
        farplane.shape[-1] <= FAST_FFT_MAX_SIZE
        and farplane.shape[-2] <= FAST_FFT_MAX_SIZE
    ):
        return matmul_fft2(farplane, inverse=True)
    return propagation_adj(farplane)

"""Minimal jit-friendly ndimage helpers (gaussian/median filters, shifts).

Replaces the reference's calls into cupyx.scipy.ndimage (used by probe and
object constraints) with pure-jnp implementations: separable convolutions and
small-window medians, which XLA fuses into a handful of elementwise passes.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = max(int(truncate * sigma + 0.5), 1)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_filter2d(
    x: jax.Array,
    sigma,
    mode: str = "constant",
    truncate: float = 4.0,
) -> jax.Array:
    """Separable 2D gaussian blur of the last two axes.

    mode: 'constant' (zero), 'wrap', or 'nearest' boundary handling.
    """
    if np.isscalar(sigma):
        sigma = (float(sigma), float(sigma))
    pad_mode = {"constant": "constant", "wrap": "wrap", "nearest": "edge"}[mode]

    out = x
    for axis, s in zip((-2, -1), sigma):
        if s <= 0:
            continue
        k = jnp.asarray(_gaussian_kernel1d(s, truncate), dtype=out.dtype)
        r = (len(k) - 1) // 2
        pad = [(0, 0)] * out.ndim
        pad[axis] = (r, r)
        xp = jnp.pad(out, pad, mode=pad_mode)
        # Correlate along `axis` as a sum of shifted slices; small kernels
        # (a few dozen taps) fuse well under XLA.
        acc = jnp.zeros_like(out)
        for i in range(len(k)):
            sl = [slice(None)] * out.ndim
            extent = out.shape[axis]
            sl[axis] = slice(i, i + extent)
            acc = acc + k[i] * xp[tuple(sl)]
        out = acc
    return out


def median_filter2d(x: jax.Array, size) -> jax.Array:
    """Median filter of the last two axes with an odd integer window.

    Boundary mode 'constant' (zeros), matching the reference's use for probe
    hot-spot removal.
    """
    sy, sx = (int(size), int(size)) if np.isscalar(size) else (
        int(size[0]), int(size[1]))
    sy, sx = max(sy, 1), max(sx, 1)
    ry, rx = sy // 2, sx // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(ry, sy - 1 - ry), (rx, sx - 1 - rx)]
    xp = jnp.pad(x, pad, mode="constant")
    h, w = x.shape[-2], x.shape[-1]
    windows = jnp.stack(
        [
            xp[..., i : i + h, j : j + w]
            for i in range(sy)
            for j in range(sx)
        ],
        axis=0,
    )
    return jnp.median(windows, axis=0)


def center_of_mass2d(x: jax.Array):
    """Center of mass of a 2D non-negative array."""
    h, w = x.shape
    total = jnp.sum(x) + 1e-32
    rows = jnp.sum(x * jnp.arange(h)[:, None]) / total
    cols = jnp.sum(x * jnp.arange(w)[None, :]) / total
    return rows, cols


def integer_shift2d(x: jax.Array, shift, fill=0.0) -> jax.Array:
    """Shift the last two axes by integer offsets, filling with a constant."""
    dy, dx = shift
    h, w = x.shape[-2], x.shape[-1]
    out = jnp.roll(x, (dy, dx), axis=(-2, -1))
    row_idx = jnp.arange(h)
    col_idx = jnp.arange(w)
    row_invalid = jnp.where(
        dy >= 0, row_idx < dy, row_idx >= h + dy
    )
    col_invalid = jnp.where(
        dx >= 0, col_idx < dx, col_idx >= w + dx
    )
    invalid = row_invalid[:, None] | col_invalid[None, :]
    return jnp.where(invalid, jnp.asarray(fill, dtype=x.dtype), out)

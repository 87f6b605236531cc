"""Bilinear patch extraction / accumulation at fractional scan positions.

TPU-native replacement for the reference CUDA kernels `fwd_patch`/`adj_patch`
(`/root/reference/src/tike/operators/cupy/convolution.cu:146-165` launched from
`patch.py:79-188`). Instead of one CUDA thread per patch pixel with atomicAdd,
we express the same linear operator as XLA-friendly primitives:

- forward: a vmapped ``dynamic_slice`` of a (P+1, P+1) window per position,
  then a bilinear combination of the window's four integer-shifted corners.
  XLA lowers this to a batched gather; there is no data-dependent control flow.
- adjoint: the exact transpose — spread each patch into a (P+1, P+1) window
  with the four bilinear corner weights, then a single scatter-add of all
  windows into the image. Scatter-add is deterministic on TPU (no atomics).

Semantics notes (match the reference):
- ``positions`` are (y, x) coordinates of the *minimum corner* of each patch
  in image coordinates; fractional parts trigger bilinear interpolation.
- Positions are assumed in-bounds, i.e. ``1 <= pos`` and
  ``pos + patch_width + 1 <= image_shape`` (the reference enforces this via
  ``check_allowed_positions``); out-of-bounds behavior is clamping (XLA
  dynamic_slice/scatter semantics) rather than the reference's zero-weighting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _c2f(x):
    """View complex as trailing-axis (re, im) float pairs.

    TPU gathers/dynamic-slices on complex dtypes are unsupported on some
    backends (and slower even where supported); all windowed gathers and
    scatters below run on float pairs and recombine at the end. Real inputs
    pass through unchanged.
    """
    if jnp.iscomplexobj(x):
        return jnp.stack([x.real, x.imag], axis=-1)
    return x[..., None]


def _f2c(x, dtype):
    if jnp.issubdtype(dtype, jnp.complexfloating):
        return jax.lax.complex(x[..., 0], x[..., 1]).astype(dtype)
    return x[..., 0].astype(dtype)


def _split_positions(positions):
    """Split float positions into integer corners and fractional weights."""
    lo = jnp.floor(positions)
    frac = positions - lo
    return lo.astype(jnp.int32), frac


def patch_fwd(
    images: jax.Array,
    positions: jax.Array,
    patch_width: int,
) -> jax.Array:
    """Extract bilinearly-interpolated square patches from an image.

    Parameters
    ----------
    images : (H, W) complex
    positions : (N, 2) float — (y, x) min-corner of each patch
    patch_width : int — static width P of the extracted patches

    Returns
    -------
    patches : (N, P, P) complex
    """
    corner, frac = _split_positions(positions)
    fy = frac[:, 0][:, None, None, None]
    fx = frac[:, 1][:, None, None, None]
    imf = _c2f(images)  # (H, W, C)
    nch = imf.shape[-1]

    def one_window(c):
        return jax.lax.dynamic_slice(
            imf, (c[0], c[1], 0), (patch_width + 1, patch_width + 1, nch)
        )

    win = jax.vmap(one_window)(corner)  # (N, P+1, P+1, C)
    out = (
        (1 - fy) * (1 - fx) * win[:, :-1, :-1]
        + (1 - fy) * fx * win[:, :-1, 1:]
        + fy * (1 - fx) * win[:, 1:, :-1]
        + fy * fx * win[:, 1:, 1:]
    )
    return _f2c(out, images.dtype)


def _spread_windows_f(patches_f: jax.Array, frac: jax.Array) -> jax.Array:
    """Spread (N, P, P, C) float patches into (N, P+1, P+1, C) windows."""
    n, p, _, c = patches_f.shape
    fy = frac[:, 0][:, None, None, None]
    fx = frac[:, 1][:, None, None, None]
    win = jnp.zeros((n, p + 1, p + 1, c), dtype=patches_f.dtype)
    win = win.at[:, :-1, :-1].add((1 - fy) * (1 - fx) * patches_f)
    win = win.at[:, :-1, 1:].add((1 - fy) * fx * patches_f)
    win = win.at[:, 1:, :-1].add(fy * (1 - fx) * patches_f)
    win = win.at[:, 1:, 1:].add(fy * fx * patches_f)
    return win


def patch_adj_scatter(
    patches: jax.Array,
    positions: jax.Array,
    images_shape: tuple[int, int],
    images: jax.Array | None = None,
) -> jax.Array:
    """patch_adj via one big XLA scatter-add (reference oracle formulation).

    TPU scatters with colliding indices serialize per element, so this is
    the slow path there; see :func:`patch_adj` for the production version.
    """
    h, w = images_shape
    n, p, _ = patches.shape
    corner, frac = _split_positions(positions)
    pf = _c2f(patches)
    win = _spread_windows_f(pf, frac)  # (N, P+1, P+1, C)
    nch = win.shape[-1]

    span = jnp.arange(p + 1, dtype=jnp.int32)
    rows = corner[:, 0:1] + span[None, :]  # (N, P+1)
    cols = corner[:, 1:2] + span[None, :]  # (N, P+1)
    flat = (rows[:, :, None] * w + cols[:, None, :]).reshape(-1)

    if images is None:
        acc = jnp.zeros((h * w, nch), dtype=pf.dtype)
    else:
        acc = _c2f(images).reshape(h * w, nch)
    acc = acc.at[flat].add(
        win.reshape(-1, nch), mode="drop", unique_indices=False
    )
    return _f2c(acc.reshape(h, w, nch), patches.dtype)


def patch_adj(
    patches: jax.Array,
    positions: jax.Array,
    images_shape: tuple[int, int],
    images: jax.Array | None = None,
) -> jax.Array:
    """Adjoint of :func:`patch_fwd`: accumulate patches into an image.

    Implemented as a `lax.scan` of per-position window read-modify-writes
    (dynamic_slice + add + dynamic_update_slice): N sequential steps of
    (P+1)^2 *vector* adds, instead of one scatter whose colliding indices
    TPUs serialize per *element*. Overlapping windows are handled exactly
    because the accumulation is sequential.

    Parameters
    ----------
    patches : (N, P, P) complex
    positions : (N, 2) float
    images_shape : (H, W) — static output shape
    images : optional (H, W) initial accumulator
    """
    h, w = images_shape
    n, p, _ = patches.shape
    corner, frac = _split_positions(positions)
    pf = _c2f(patches)
    win = _spread_windows_f(pf, frac)  # (N, P+1, P+1, C)
    nch = win.shape[-1]

    if images is None:
        acc0 = jnp.zeros((h, w, nch), dtype=pf.dtype)
    else:
        acc0 = _c2f(images)

    def body(acc, inp):
        window, c = inp
        cur = jax.lax.dynamic_slice(
            acc, (c[0], c[1], 0), (p + 1, p + 1, nch)
        )
        return (
            jax.lax.dynamic_update_slice(
                acc, cur + window, (c[0], c[1], 0)
            ),
            None,
        )

    acc, _ = jax.lax.scan(body, acc0, (win, corner))
    return _f2c(acc, patches.dtype)


@functools.partial(jax.jit, static_argnames=("patch_width", "padded_width"))
def patch_fwd_padded(
    images: jax.Array,
    positions: jax.Array,
    patch_width: int,
    padded_width: int,
) -> jax.Array:
    """Extract patches zero-padded to ``padded_width`` (detector size).

    The valid P×P region is centered: offset pad = (padded - P) // 2, matching
    the reference's padding convention (`convolution.py:56-101`).
    """
    patches = patch_fwd(images, positions, patch_width)
    pad = (padded_width - patch_width) // 2
    if pad == 0 and padded_width == patch_width:
        return patches
    return jnp.pad(
        patches,
        ((0, 0), (pad, padded_width - patch_width - pad),
         (pad, padded_width - patch_width - pad)),
    )


def patch_fwd_fourier(
    images: jax.Array,
    positions: jax.Array,
    patch_width: int,
) -> jax.Array:
    """Patch extraction with Fourier-shift sub-pixel interpolation.

    Equivalent of the reference's ConvolutionFFT path
    (`convolution.py:156-292`): extract at the integer corner, then apply the
    fractional part as a Fourier phase-ramp shift of each patch. Band-limited
    (sinc) interpolation instead of bilinear.
    """
    from .shift import shift_adj

    lo = jnp.floor(positions)
    frac = positions - lo
    patches = patch_fwd(images, lo, patch_width)
    return shift_adj(patches, frac)


def patch_adj_fourier(
    patches: jax.Array,
    positions: jax.Array,
    images_shape: tuple,
    images: jax.Array | None = None,
) -> jax.Array:
    """Adjoint of :func:`patch_fwd_fourier`."""
    from .shift import shift_fwd

    lo = jnp.floor(positions)
    frac = positions - lo
    shifted = shift_fwd(patches, frac)
    return patch_adj(shifted, lo, images_shape, images)

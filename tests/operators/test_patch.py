"""Patch gather/scatter operator tests.

Mirrors the reference's `tests/operators/test_patch.py` strategy: adjoint
property plus a numpy oracle for the bilinear interpolation.
"""

import numpy as np
import jax.numpy as jnp

from tike_tpu.ops import patch_fwd, patch_adj, patch_fwd_padded
from .util import random_complex, check_adjoint

H, W, P, N = 64, 70, 16, 27


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    images = random_complex(rng, H, W)
    # In-bounds fractional positions with the reference's margin.
    positions = np.stack(
        [
            rng.uniform(1, H - P - 2, N),
            rng.uniform(1, W - P - 2, N),
        ],
        axis=-1,
    ).astype(np.float32)
    patches = random_complex(rng, N, P, P)
    return images, positions, patches


def _patch_fwd_oracle(images, positions, p):
    """Pure-numpy bilinear patch extraction oracle."""
    out = np.zeros((len(positions), p, p), dtype=images.dtype)
    for i, (y, x) in enumerate(positions):
        iy, ix = int(np.floor(y)), int(np.floor(x))
        fy, fx = y - iy, x - ix
        win = images[iy : iy + p + 1, ix : ix + p + 1]
        out[i] = (
            (1 - fy) * (1 - fx) * win[:-1, :-1]
            + (1 - fy) * fx * win[:-1, 1:]
            + fy * (1 - fx) * win[1:, :-1]
            + fy * fx * win[1:, 1:]
        )
    return out


def test_fwd_matches_oracle():
    images, positions, _ = _setup()
    got = np.asarray(patch_fwd(jnp.asarray(images), jnp.asarray(positions), P))
    want = _patch_fwd_oracle(images, positions, P)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_adjoint():
    images, positions, patches = _setup()
    fwd = patch_fwd(jnp.asarray(images), jnp.asarray(positions), P)
    adj = patch_adj(jnp.asarray(patches), jnp.asarray(positions), (H, W))
    check_adjoint(fwd, images, adj, patches)


def test_adjoint_integer_positions():
    images, positions, patches = _setup()
    positions = np.floor(positions).astype(np.float32)
    fwd = patch_fwd(jnp.asarray(images), jnp.asarray(positions), P)
    adj = patch_adj(jnp.asarray(patches), jnp.asarray(positions), (H, W))
    check_adjoint(fwd, images, adj, patches)


def test_fwd_padded_centers_patch():
    images, positions, _ = _setup()
    det = P + 10
    padded = np.asarray(
        patch_fwd_padded(jnp.asarray(images), jnp.asarray(positions), P, det)
    )
    assert padded.shape == (N, det, det)
    pad = (det - P) // 2
    inner = padded[:, pad : pad + P, pad : pad + P]
    np.testing.assert_allclose(
        inner, _patch_fwd_oracle(images, positions, P), rtol=1e-5, atol=1e-5
    )
    # Everything outside the central region is zero padding.
    total = np.abs(padded).sum()
    np.testing.assert_allclose(total, np.abs(inner).sum(), rtol=1e-6)


def test_accumulation_into_existing_image():
    images, positions, patches = _setup()
    base = random_complex(np.random.default_rng(7), H, W)
    out = patch_adj(
        jnp.asarray(patches), jnp.asarray(positions), (H, W), jnp.asarray(base)
    )
    zero = patch_adj(jnp.asarray(patches), jnp.asarray(positions), (H, W))
    np.testing.assert_allclose(
        np.asarray(out), base + np.asarray(zero), rtol=1e-5, atol=1e-5
    )


def test_fourier_patch_adjoint_and_integer_agreement():
    from tike_tpu.ops.patch import patch_fwd_fourier, patch_adj_fourier

    images, positions, patches = _setup()
    f = patch_fwd_fourier(jnp.asarray(images), jnp.asarray(positions), P)
    a = patch_adj_fourier(jnp.asarray(patches), jnp.asarray(positions), (H, W))
    check_adjoint(f, images, a, patches, rtol=1e-3)
    # At integer positions, Fourier and bilinear paths agree exactly.
    ipos = np.floor(positions).astype(np.float32)
    f_int = patch_fwd_fourier(jnp.asarray(images), jnp.asarray(ipos), P)
    b_int = patch_fwd(jnp.asarray(images), jnp.asarray(ipos), P)
    np.testing.assert_allclose(
        np.asarray(f_int), np.asarray(b_int), rtol=1e-4, atol=1e-5
    )


def test_patch_ops_irregular_sizes():
    """Adjoint property + oracle across patch widths and dense/sparse
    regimes, including non-power-of-2 and odd widths.

    Exercises both accumulation paths of patch_adj (the dense merged-cell
    path when windows outnumber grid cells, the per-window scan otherwise)
    and the tile padding for widths that do not quarter evenly.
    """
    import jax

    rng = np.random.default_rng(3)
    for p, h, w, n in [
        (8, 48, 48, 100),     # dense -> merged-cell path
        (24, 100, 90, 12),    # sparse -> per-window scan path
        (100, 260, 300, 40),  # non-power-of-2, tile pads unevenly
        (33, 140, 150, 80),   # odd width
    ]:
        images = random_complex(rng, h, w)
        positions = np.stack(
            [rng.uniform(1, h - p - 2, n), rng.uniform(1, w - p - 2, n)],
            axis=-1,
        ).astype(np.float32)
        patches = random_complex(rng, n, p, p)
        fwd = patch_fwd(jnp.asarray(images), jnp.asarray(positions), p)
        want = _patch_fwd_oracle(images, positions, p)
        np.testing.assert_allclose(
            np.asarray(fwd), want, rtol=1e-4, atol=1e-4,
            err_msg=f"p={p}",
        )
        adj = patch_adj(
            jnp.asarray(patches), jnp.asarray(positions), (h, w)
        )
        check_adjoint(fwd, images, adj, patches)
        # patch_adj agrees with the scatter-oracle formulation.
        from tike_tpu.ops.patch import patch_adj_scatter

        oracle = patch_adj_scatter(
            jnp.asarray(patches), jnp.asarray(positions), (h, w)
        )
        scale = float(jnp.max(jnp.abs(oracle)))
        assert (
            float(jnp.max(jnp.abs(adj - oracle))) / scale < 1e-4
        ), f"p={p}"

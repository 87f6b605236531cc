"""Alignment operator family tests: adjoints + inverse round trips."""

import numpy as np
import jax.numpy as jnp

from tike_tpu.ops.interp import remap_lanczos_adj, remap_lanczos_fwd
from tike_tpu.ops.pad import pad_adj, pad_fwd
from tike_tpu.ops.rotate import rotate_adj, rotate_fwd, rotate_inv
from tike_tpu.ops.shift import shift_adj, shift_fwd
from tike_tpu.ops.flow import flow_adj, flow_fwd
from .util import random_complex, check_adjoint


def test_remap_lanczos_adjoint():
    rng = np.random.default_rng(0)
    Fe = random_complex(rng, 32, 40)
    x = np.stack(
        [rng.uniform(3, 28, 50), rng.uniform(3, 36, 50)], -1
    ).astype(np.float32)
    pts = random_complex(rng, 50)
    f = remap_lanczos_fwd(jnp.asarray(Fe), jnp.asarray(x), 2)
    a = remap_lanczos_adj(jnp.asarray(pts), jnp.asarray(x), 2, (32, 40))
    check_adjoint(f, Fe, a, pts, rtol=1e-3)


def test_remap_identity_at_grid_points():
    rng = np.random.default_rng(1)
    Fe = random_complex(rng, 16, 16)
    iy, ix = np.mgrid[3:13, 3:13]
    x = np.stack([iy.ravel(), ix.ravel()], -1).astype(np.float32)
    got = np.asarray(remap_lanczos_fwd(jnp.asarray(Fe), jnp.asarray(x), 2))
    np.testing.assert_allclose(
        got, Fe[3:13, 3:13].ravel(), rtol=1e-4, atol=1e-5
    )


def test_shift_adjoint_and_round_trip():
    rng = np.random.default_rng(2)
    a = random_complex(rng, 4, 16, 16)
    b = random_complex(rng, 4, 16, 16)
    s = rng.uniform(-3, 3, (4, 2)).astype(np.float32)
    f = shift_fwd(jnp.asarray(a), jnp.asarray(s))
    adj = shift_adj(jnp.asarray(b), jnp.asarray(s))
    check_adjoint(f, a, adj, b, rtol=1e-4)
    # Fourier shift is unitary; round trip is identity.
    np.testing.assert_allclose(
        np.asarray(shift_adj(f, jnp.asarray(s))), a, rtol=1e-4, atol=1e-5
    )


def test_pad_adjoint():
    rng = np.random.default_rng(3)
    unpadded = random_complex(rng, 5, 8, 8)
    padded = random_complex(rng, 5, 16, 20)
    corner = np.stack(
        [rng.integers(0, 8, 5), rng.integers(0, 12, 5)], -1
    ).astype(np.int32)
    f = pad_fwd(jnp.asarray(unpadded), jnp.asarray(corner), (5, 16, 20))
    a = pad_adj(jnp.asarray(padded), jnp.asarray(corner), (5, 8, 8))
    check_adjoint(f, unpadded, a, padded, rtol=1e-5)


def test_rotate_adjoint_and_inverse():
    rng = np.random.default_rng(4)
    f0 = random_complex(rng, 2, 24, 24)
    g0 = random_complex(rng, 2, 24, 24)
    angle = 0.3
    f = rotate_fwd(jnp.asarray(f0), angle)
    a = rotate_adj(jnp.asarray(g0), angle)
    check_adjoint(f, f0, a, g0, rtol=1e-3)
    # Round trip approximately inverts for a smooth (band-limited) image —
    # Lanczos resampling cannot round-trip white noise.
    yy, xx = np.mgrid[0:24, 0:24] / 24
    smooth = np.exp(1j * np.sin(2 * np.pi * yy) * np.cos(2 * np.pi * xx)).astype(
        np.complex64
    )[None]
    back = np.asarray(rotate_inv(rotate_fwd(jnp.asarray(smooth), angle), angle))
    inner = np.s_[:, 8:16, 8:16]
    np.testing.assert_allclose(back[inner], smooth[inner], rtol=0.05, atol=0.05)


def test_flow_adjoint_and_zero_flow_identity():
    rng = np.random.default_rng(5)
    f0 = random_complex(rng, 3, 16, 16)
    g0 = random_complex(rng, 3, 16, 16)
    flow = (rng.random((3, 16, 16, 2)) - 0.5).astype(np.float32) * 2
    f = flow_fwd(jnp.asarray(f0), jnp.asarray(flow))
    a = flow_adj(jnp.asarray(g0), jnp.asarray(flow))
    check_adjoint(f, f0, a, g0, rtol=1e-3)
    zero = np.zeros((3, 16, 16, 2), np.float32)
    np.testing.assert_allclose(
        np.asarray(flow_fwd(jnp.asarray(f0), jnp.asarray(zero))),
        f0,
        rtol=1e-4,
        atol=1e-5,
    )

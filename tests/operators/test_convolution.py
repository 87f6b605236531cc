"""Convolution (object-probe interaction) operator tests.

Mirrors `tests/operators/test_convolution.py`: the three-way adjoint of the
nearplane = patches(psi) * probe bilinear form, checked separately in psi and
probe, including the padded-detector case.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tike_tpu.ops.patch import patch_adj, patch_fwd, patch_fwd_padded
from .util import random_complex, check_adjoint

H, W, P, DET, B, M = 50, 54, 12, 20, 9, 2


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    psi = random_complex(rng, H, W)
    probe = random_complex(rng, 1, M, P, P)
    scan = np.stack(
        [rng.uniform(1, H - P - 2, B), rng.uniform(1, W - P - 2, B)], -1
    ).astype(np.float32)
    nearplane = random_complex(rng, B, M, P, P)
    return psi, probe, scan, nearplane


def test_convolution_adjoint_psi():
    """<patches(psi)*probe, d> == <psi, patch_adj(conj(probe)*d)>."""
    psi, probe, scan, near = _setup()
    patches = patch_fwd(jnp.asarray(psi), jnp.asarray(scan), P)
    fwd = patches[:, None] * jnp.asarray(probe)[0]
    adj = patch_adj(
        jnp.sum(jnp.conj(jnp.asarray(probe)[0]) * jnp.asarray(near), axis=1),
        jnp.asarray(scan),
        (H, W),
    )
    check_adjoint(fwd, psi, adj, near)


def test_convolution_adjoint_probe():
    """<patches(psi)*probe, d> == <probe, sum_pos conj(patches)*d>."""
    psi, probe, scan, near = _setup()
    patches = patch_fwd(jnp.asarray(psi), jnp.asarray(scan), P)
    fwd = patches[:, None] * jnp.asarray(probe)[0]
    adj_probe = jnp.sum(
        jnp.conj(patches)[:, None] * jnp.asarray(near), axis=0, keepdims=True
    )
    check_adjoint(fwd, probe, adj_probe, near)


def test_padded_convolution_energy():
    """Zero-padding to the detector preserves nearplane energy."""
    psi, probe, scan, _ = _setup()
    padded = patch_fwd_padded(jnp.asarray(psi), jnp.asarray(scan), P, DET)
    unpadded = patch_fwd(jnp.asarray(psi), jnp.asarray(scan), P)
    np.testing.assert_allclose(
        float(jnp.sum(jnp.abs(padded) ** 2)),
        float(jnp.sum(jnp.abs(unpadded) ** 2)),
        rtol=1e-5,
    )

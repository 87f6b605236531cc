"""Propagation operator tests: adjoint + unitarity (ortho FFT)."""

import numpy as np
import jax.numpy as jnp

from tike_tpu.ops import (
    propagation_fwd,
    propagation_adj,
    fresnel_spectrum_propagator,
    fresnel_fwd,
    fresnel_adj,
)
from .util import random_complex, check_adjoint, check_scaled


def test_propagation_adjoint_and_unitary():
    rng = np.random.default_rng(0)
    near = random_complex(rng, 5, 3, 32, 32)
    far = random_complex(rng, 5, 3, 32, 32)
    f = propagation_fwd(jnp.asarray(near))
    a = propagation_adj(jnp.asarray(far))
    check_adjoint(f, near, a, far)
    check_scaled(propagation_fwd(a), far)
    # Round trip is identity for a unitary operator.
    np.testing.assert_allclose(
        np.asarray(propagation_adj(f)), near, rtol=1e-5, atol=1e-5
    )


def test_fresnel_adjoint_and_energy_conservation():
    rng = np.random.default_rng(1)
    prop = fresnel_spectrum_propagator(
        (32, 32), (1e-6, 1e-6), 5e-7, 1.4e-10
    )
    # Propagating band-limited fields conserves energy (|H| = 1 in the
    # propagating band).
    near = random_complex(rng, 4, 32, 32)
    far = random_complex(rng, 4, 32, 32)
    f = fresnel_fwd(jnp.asarray(near), prop)
    a = fresnel_adj(jnp.asarray(far), prop)
    check_adjoint(f, near, a, far)


def test_fresnel_zero_distance_is_identity():
    rng = np.random.default_rng(2)
    prop = fresnel_spectrum_propagator((16, 16), (1e-6, 1e-6), 0.0, 1e-10)
    near = random_complex(rng, 2, 16, 16)
    np.testing.assert_allclose(
        np.asarray(fresnel_fwd(jnp.asarray(near), prop)),
        near,
        rtol=1e-5,
        atol=1e-5,
    )

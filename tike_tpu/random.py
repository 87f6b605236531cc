"""Random number helpers for complex data types.

Equivalent of `/root/reference/src/tike/random.py`. A module-level seeded
generator provides reproducible host-side randomness (batch permutations,
RANSAC subsets); jax PRNG keys are used inside jitted code.
"""

import numpy as np

from .precision import cfloating, floating

randomizer_np = np.random.default_rng()


def numpy_complex(*shape, rng=None):
    """Return a complex random array in the range [-0.5, 0.5)."""
    rng = randomizer_np if rng is None else rng
    return (
        rng.random(size=(*shape, 2), dtype=floating) - 0.5
    ).view(cfloating)[..., 0]

"""Device-to-host transfer helpers.

Some JAX backends (notably the tunneled axon TPU relay used in development)
cannot download complex-valued device arrays directly; real and imaginary
parts must be fetched as separate float transfers. ``to_host`` hides this by
splitting complex downloads on non-CPU backends (negligible overhead, and a
failed complex transfer can poison the runtime, so no try/except probing).
"""

from __future__ import annotations

import jax
import numpy as np


def to_host(x) -> np.ndarray:
    """Return a numpy copy of x, splitting complex transfers when needed."""
    if x is None:
        return None
    if isinstance(x, np.ndarray):
        return x
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if np.issubdtype(x.dtype, np.complexfloating):
        platform = next(iter(x.devices())).platform
        if platform != "cpu":
            real = np.asarray(x.real)
            imag = np.asarray(x.imag)
            return (real + 1j * imag).astype(x.dtype)
    return np.asarray(x)

"""Complex-as-float-pair program boundaries for unreliable TPU backends.

Empirical finding on the tunneled axon TPU relay: XLA programs whose
*internals* use complex64 (FFTs, complex multiplies) run correctly, but any
complex64 array crossing a program boundary — as a program input, output, or
host transfer — fails or hangs. The fix is representational: on such
backends, complex device state lives as trailing-axis (real, imag) float32
pairs wrapped in the :class:`Pair` pytree node, and :func:`pair_jit` wraps
jitted functions so pairs are recombined to complex immediately inside the
program and split back to pairs before returning.

On well-behaved backends (CPU, directly-attached TPU/GPU), ``PAIR_MODE`` is
off and ``pair_jit`` degenerates to ``jax.jit`` with zero overhead.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _detect_pair_mode() -> bool:
    env = os.environ.get("TIKE_PAIR_MODE")
    if env is not None:
        return env not in ("0", "false", "False")
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    # Known-good platforms keep native complex boundaries.
    return platform not in ("cpu", "gpu", "cuda", "rocm")


_PAIR_MODE: bool | None = None


def pair_mode() -> bool:
    """Whether complex program boundaries must be avoided (lazy-detected).

    Detection touches `jax.devices()`, which initializes the XLA backend —
    so it must NOT run at import time: multi-process users call
    `tike_tpu.parallel.distributed.initialize()` after importing the
    package, and `jax.distributed.initialize` refuses to run once the
    backend exists. The first pair_jit/upload call triggers detection.
    """
    global _PAIR_MODE
    if _PAIR_MODE is None:
        _PAIR_MODE = _detect_pair_mode()
    return _PAIR_MODE


def __getattr__(name):
    # Backwards-compatible module attribute: `from pairs import PAIR_MODE`.
    if name == "PAIR_MODE":
        return pair_mode()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


@jax.tree_util.register_pytree_node_class
class Pair:
    """A complex array stored as a (..., 2) float array (re, im).

    Behaves enough like a complex jax array for the solver glue code:
    shape/ndim/dtype, linear arithmetic (+, -, scalar *), block_until_ready.
    Nonlinear complex math must happen inside `pair_jit` programs.
    """

    __slots__ = ("data",)

    def __init__(self, data):
        self.data = data  # (..., 2) float array

    # --- pytree protocol ---
    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # --- array-like surface ---
    @property
    def shape(self):
        return self.data.shape[:-1]

    @property
    def ndim(self):
        return self.data.ndim - 1

    @property
    def size(self):
        return int(np.prod(self.shape)) if self.shape else 1

    @property
    def dtype(self):
        return jnp.complex64 if self.data.dtype == jnp.float32 else (
            jnp.complex128
        )

    @property
    def real(self):
        return self.data[..., 0]

    @property
    def imag(self):
        return self.data[..., 1]

    def __add__(self, other):
        if isinstance(other, Pair):
            return Pair(self.data + other.data)
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, Pair):
            return Pair(self.data - other.data)
        return NotImplemented

    def __neg__(self):
        return Pair(-self.data)

    def __mul__(self, s):
        # Real-scalar multiplication commutes with the pair representation.
        if isinstance(s, Pair) or (
            hasattr(s, "dtype") and jnp.issubdtype(s.dtype, jnp.complexfloating)
        ):
            return NotImplemented
        return Pair(self.data * s)

    __rmul__ = __mul__

    def __truediv__(self, s):
        if isinstance(s, Pair):
            return NotImplemented
        return Pair(self.data / s)

    def __repr__(self):
        return f"Pair(shape={self.shape}, dtype={self.dtype})"

    def block_until_ready(self):
        self.data.block_until_ready()
        return self


def is_pair(x) -> bool:
    return isinstance(x, Pair)


def complex_to_pair_host(x: np.ndarray) -> np.ndarray:
    """Host-side complex -> (..., 2) float32 (no device involvement)."""
    return np.stack(
        [np.asarray(x).real, np.asarray(x).imag], axis=-1
    ).astype(np.float32)


def pair_to_complex_host(data: np.ndarray) -> np.ndarray:
    return (data[..., 0] + 1j * data[..., 1]).astype(np.complex64)


def upload(x, dtype=None):
    """Upload a host array; complex becomes a Pair in pair mode."""
    x = np.asarray(x) if not isinstance(x, (jax.Array, Pair)) else x
    if isinstance(x, Pair) or isinstance(x, jax.Array):
        return x
    if dtype is not None:
        x = x.astype(dtype)
    if pair_mode() and np.issubdtype(x.dtype, np.complexfloating):
        return Pair(jnp.asarray(complex_to_pair_host(x)))
    return jnp.asarray(x)


def download(x) -> np.ndarray:
    """Download to host; Pair becomes complex numpy."""
    from .transfer import to_host

    if isinstance(x, Pair):
        return pair_to_complex_host(to_host(x.data))
    return to_host(x)


def _pairs_to_complex(tree):
    """Inside-jit: recombine every Pair leaf to a complex array."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.lax.complex(
            leaf.data[..., 0], leaf.data[..., 1]
        )
        if isinstance(leaf, Pair)
        else leaf,
        tree,
        is_leaf=is_pair,
    )


def _complex_to_pairs(tree):
    """Inside-jit: split every complex leaf into a Pair."""
    def split(leaf):
        if leaf is not None and hasattr(leaf, "dtype") and jnp.issubdtype(
            jnp.asarray(leaf).dtype, jnp.complexfloating
        ):
            arr = jnp.asarray(leaf)
            return Pair(jnp.stack([arr.real, arr.imag], axis=-1))
        return leaf

    return jax.tree_util.tree_map(split, tree)


def pair_jit(fn=None, *, static_argnames=()):
    """jit with complex-free program boundaries (when PAIR_MODE).

    Inputs may contain Pair leaves (recombined to complex inside the
    program); complex outputs are returned as Pair leaves. When PAIR_MODE is
    off this is exactly jax.jit — callers pass ordinary complex arrays.
    """
    if fn is None:
        return functools.partial(pair_jit, static_argnames=static_argnames)

    # Pair-mode detection initializes the XLA backend, so it is deferred to
    # the first call (imports must stay backend-free for jax.distributed).
    compiled = {}

    @functools.wraps(fn)
    def dispatch(*args, **kwargs):
        if not pair_mode():
            if "plain" not in compiled:
                compiled["plain"] = jax.jit(
                    fn, static_argnames=static_argnames
                )
            return compiled["plain"](*args, **kwargs)
        if "pair" not in compiled:

            # functools.wraps exposes fn's signature so static_argnames
            # resolve against the real parameter names (inner's *a/**k
            # would otherwise hide them and silently trace static args).
            @functools.partial(jax.jit, static_argnames=static_argnames)
            @functools.wraps(fn)
            def inner(*a, **k):
                a, k = _pairs_to_complex((a, k))
                return _complex_to_pairs(fn(*a, **k))

            compiled["pair"] = inner
        return compiled["pair"](*args, **kwargs)

    return dispatch

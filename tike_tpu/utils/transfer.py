"""Device-to-host transfer helpers for unreliable relay backends.

The tunneled axon TPU relay used in development only implements downloads of
default-layout, lane-aligned buffers: arrays whose trailing dimension is a
multiple of 128 in float32/int32. Anything else — complex dtypes, small or
oddly-shaped arrays, scalars, reduction outputs with alternate layouts —
fails with UNIMPLEMENTED (and poisons later transfers in the process).

``to_host`` therefore routes every non-CPU download through an "export"
program that flattens, zero-pads to a multiple of 128 lanes, and reshapes to
(k, 128) before the transfer; complex arrays ship as separate real/imag
exports. On CPU (and presumably on directly-attached TPUs) this is bypassed.

Use ``scalar(x)`` instead of ``float(x)`` for device scalars.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _export(v):
    flat = v.reshape(-1)
    n = flat.shape[0]
    k = -(-n // 128) * 128
    return jnp.pad(flat, (0, k - n)).reshape(-1, 128)


@jax.jit
def _export_complex(v):
    flat = v.reshape(-1)
    n = flat.shape[0]
    k = -(-n // 128) * 128
    r = jnp.pad(flat.real, (0, k - n)).reshape(-1, 128)
    i = jnp.pad(flat.imag, (0, k - n)).reshape(-1, 128)
    return r, i


def _download_real(x) -> np.ndarray:
    last_err = None
    for _ in range(3):
        try:
            out = np.asarray(_export(x))
            return (
                out.reshape(-1)[: x.size].reshape(x.shape).astype(x.dtype)
            )
        except Exception as e:  # transient relay failures
            last_err = e
    raise last_err


def _needs_export(x: jax.Array) -> bool:
    try:
        platform = next(iter(x.devices())).platform
    except Exception:
        return False
    return platform != "cpu"


def to_host(x) -> np.ndarray:
    """Return a numpy copy of x, via the export path on non-CPU backends."""
    if x is None:
        return None
    if isinstance(x, np.ndarray):
        return x
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if not _needs_export(x):
        return np.asarray(x)
    if np.issubdtype(x.dtype, np.complexfloating):
        # real/imag split happens inside one jitted program so no eager
        # primitive or unaligned buffer is ever materialized on the relay.
        last_err = None
        for _ in range(3):
            try:
                r, i = _export_complex(x)
                real = np.asarray(r).reshape(-1)[: x.size]
                imag = np.asarray(i).reshape(-1)[: x.size]
                return (real + 1j * imag).reshape(x.shape).astype(x.dtype)
            except Exception as e:
                last_err = e
        raise last_err
    if x.dtype == jnp.bool_:
        return _download_real(x.astype(jnp.int32)).astype(bool)
    return _download_real(x)


def scalar(x, default: float | None = None) -> float:
    """Like float(x) but safe for device scalars on relay backends.

    If `default` is given, persistent transfer failures return it instead of
    raising — solvers use this so cost bookkeeping cannot kill a
    reconstruction on a flaky relay.
    """
    try:
        if isinstance(x, jax.Array) and _needs_export(x):
            return float(to_host(x.reshape(1))[0])
        return float(x)
    except Exception:
        if default is None:
            raise
        return default

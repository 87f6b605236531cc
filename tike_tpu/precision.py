"""Global dtype policy for tike-tpu.

Mirrors the reference policy (`/root/reference/src/tike/precision.py:1-12`):
all compute is float32 / complex64. TPU MXU prefers bfloat16 for matmuls, but
ptychographic phase retrieval is FFT- and phase-dominated, so single precision
is the accuracy floor; individual kernels may internally downcast where safe.
"""

import numpy as np
import jax.numpy as jnp

floating = np.float32
cfloating = np.complex64
integer = np.int32

jfloating = jnp.float32
jcfloating = jnp.complex64
jinteger = jnp.int32

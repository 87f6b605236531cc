#!/usr/bin/env python
"""Micro-benchmarks of the hot kernels on the TPU chip.

Compares implementation choices so the solver picks the fastest:
- far-field FFT: XLA fft vs DFT-matmul on the MXU
- patch gather/scatter: XLA gather/scatter-add vs Pallas DMA kernels

Prints per-op timings; no large device-to-host transfers (tunnel-safe).
"""

import time

import numpy as np


def timeit(fn, *args, iters=20):
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def main():
    import jax
    import jax.numpy as jnp

    from tike_tpu.ops.patch import patch_adj, patch_fwd
    from tike_tpu.ops.patch_pallas import patch_adj_pallas, patch_fwd_pallas
    from tike_tpu.ops.propagation import matmul_fft2

    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))  # warmup

    rng = np.random.default_rng(0)
    B, P, HW = 1024, 128, 1500
    x = jnp.asarray(
        (
            rng.standard_normal((B, P, P)) + 1j * rng.standard_normal((B, P, P))
        ).astype(np.complex64)
    )

    f_xla = jax.jit(lambda v: jnp.fft.fft2(v, norm="ortho"))
    f_mm = jax.jit(lambda v: matmul_fft2(v))
    t_xla = timeit(f_xla, x)
    t_mm = timeit(f_mm, x)
    print(f"fft2 {B}x{P}x{P}: xla {t_xla*1e3:.2f} ms, matmul {t_mm*1e3:.2f} ms")

    img = jnp.asarray(
        (
            rng.standard_normal((HW, HW)) + 1j * rng.standard_normal((HW, HW))
        ).astype(np.complex64)
    )
    pos = jnp.asarray(
        np.stack(
            [rng.uniform(2, HW - P - 3, B), rng.uniform(2, HW - P - 3, B)], -1
        ).astype(np.float32)
    )
    g_xla = jax.jit(lambda i, p: patch_fwd(i, p, P))
    g_pl = jax.jit(lambda i, p: patch_fwd_pallas(i, p, P))
    t_gx = timeit(g_xla, img, pos)
    print(f"patch_fwd {B}x{P}^2 from {HW}^2: xla {t_gx*1e3:.2f} ms", flush=True)
    try:
        t_gp = timeit(g_pl, img, pos)
        print(f"patch_fwd pallas: {t_gp*1e3:.2f} ms")
    except Exception as e:
        print("patch_fwd pallas FAILED:", str(e)[:120])

    pats = jnp.asarray(
        (
            rng.standard_normal((B, P, P)) + 1j * rng.standard_normal((B, P, P))
        ).astype(np.complex64)
    )
    s_xla = jax.jit(lambda q, p: patch_adj(q, p, (HW, HW)))
    s_pl = jax.jit(lambda q, p: patch_adj_pallas(q, p, (HW, HW)))
    t_sx = timeit(s_xla, pats, pos)
    print(f"patch_adj: xla {t_sx*1e3:.2f} ms", flush=True)
    try:
        t_sp = timeit(s_pl, pats, pos)
        print(f"patch_adj pallas: {t_sp*1e3:.2f} ms")
    except Exception as e:
        print("patch_adj pallas FAILED:", str(e)[:120])


if __name__ == "__main__":
    main()

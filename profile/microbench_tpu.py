#!/usr/bin/env python
"""Micro-benchmarks of the hot kernels on the TPU chip.

Compares implementation choices so the solver picks the fastest:
- far-field FFT: XLA fft vs DFT-matmul on the MXU
- patch gather/scatter: XLA selection-matrix ops vs Pallas DMA kernels

Relay-safe: each candidate op repeats K times inside ONE jitted lax.scan
(host dispatch latency amortizes away), inputs/outputs cross the program
boundary as floats only, and a single scalar is downloaded per timing.

Usage: python profile/microbench_tpu.py [B] [K]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from tike_tpu.ops.patch import patch_adj, patch_fwd
    from tike_tpu.ops.patch_pallas import patch_adj_pallas, patch_fwd_pallas
    from tike_tpu.ops.propagation import matmul_fft2
    from tike_tpu.utils.pairs import Pair, pair_jit
    from tike_tpu.utils.transfer import to_host

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    P, HW = 128, 1500
    rng = np.random.default_rng(0)

    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))  # warmup

    results = {}

    def repeat(name, fn, *args):
        """Time K in-program repetitions of fn; returns ms/op or None."""

        @pair_jit
        def prog(*a):
            def body(carry, _):
                out = fn(carry, *a)
                return out, None

            out, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=K)
            return out

        def once():
            return to_host(prog(*args).reshape(1))

        try:
            once()  # compile
            t0 = time.perf_counter()
            once()
            once()
            dt = (time.perf_counter() - t0) / 2 / K * 1e3
            print(f"{name:>24s}: {dt:8.3f} ms/op", flush=True)
            results[name] = dt
            return dt
        except Exception as e:
            print(f"{name:>24s}: FAILED {str(e)[:110]}", flush=True)
            results[name] = None
            return None

    def cpair(shape):
        return Pair(
            jnp.asarray(
                rng.standard_normal((*shape, 2)).astype(np.float32)
            )
        )

    x = cpair((B, P, P))
    img = cpair((HW, HW))
    pos = jnp.asarray(
        np.stack(
            [rng.uniform(2, HW - P - 3, B), rng.uniform(2, HW - P - 3, B)],
            -1,
        ).astype(np.float32)
    )
    pats = cpair((B, P, P))

    # Far-field FFT: XLA native vs DFT as two MXU matmuls.
    repeat(
        "fft2_xla",
        lambda c, v: jnp.real(
            jnp.fft.fft2(v * (1 + 0j * c), norm="ortho")
        ).sum()
        * 0
        + c,
        x,
    )
    repeat(
        "fft2_matmul",
        lambda c, v: jnp.real(matmul_fft2(v * (1 + 0j * c))).sum() * 0 + c,
        x,
    )

    # Patch gather: XLA selection-matrix vs Pallas DMA.
    repeat(
        "patch_fwd_xla",
        lambda c, i, p: jnp.real(patch_fwd(i * (1 + 0j * c), p, P)).sum()
        * 0
        + c,
        img,
        pos,
    )
    repeat(
        "patch_fwd_pallas",
        lambda c, i, p: jnp.real(
            patch_fwd_pallas(i * (1 + 0j * c), p, P)
        ).sum()
        * 0
        + c,
        img,
        pos,
    )

    # Patch scatter-add adjoint.
    repeat(
        "patch_adj_xla",
        lambda c, q, p: jnp.real(
            patch_adj(q * (1 + 0j * c), p, (HW, HW))
        ).sum()
        * 0
        + c,
        pats,
        pos,
    )
    repeat(
        "patch_adj_pallas",
        lambda c, q, p: jnp.real(
            patch_adj_pallas(q * (1 + 0j * c), p, (HW, HW))
        ).sum()
        * 0
        + c,
        pats,
        pos,
    )

    import json

    print(json.dumps({"B": B, "K": K, "ms_per_op": results}))


if __name__ == "__main__":
    main()

"""Benchmark: rPIE/LSQML epoch throughput on the BASELINE.json config.

North-star metric (BASELINE.md): diffraction patterns per second per chip for
one solver epoch over 10k 128x128 patterns (128x128 probe). Baseline target is
10,000 patterns/s (1 epoch < 1 s on one chip); vs_baseline = value / 10000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import tike_tpu.ptycho as tp

    n_patterns = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    det = 128
    probe_shape = 128
    num_batch = 10
    hw = 1500

    rng = np.random.default_rng(0)
    scan = np.stack(
        [
            rng.uniform(2, hw - probe_shape - 3, n_patterns),
            rng.uniform(2, hw - probe_shape - 3, n_patterns),
        ],
        -1,
    ).astype(np.float32)
    probe = (
        (tp.gaussian(probe_shape) * np.exp(1j * 0.2 * tp.gaussian(probe_shape)))
    )[None, None, None].astype(np.complex64)
    # Synthetic object; data simulated in chunks to bound memory.
    yy, xx = np.mgrid[0:hw, 0:hw] / hw
    psi = (
        np.exp(1j * 0.5 * np.sin(17 * yy) * np.cos(13 * xx))
        * (0.9 + 0.1 * np.cos(23 * xx * yy))
    ).astype(np.complex64)[None]

    data = np.empty((n_patterns, det, det), np.float32)
    chunk = 2000
    for lo in range(0, n_patterns, chunk):
        hi = min(lo + chunk, n_patterns)
        data[lo:hi] = tp.simulate(det, probe, scan[lo:hi], psi)

    params = tp.PtychoParameters(
        probe=probe,
        psi=np.full_like(psi, 0.5),
        scan=scan,
        algorithm_options=tp.RpieOptions(
            num_batch=num_batch, num_iter=1, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(),
    )

    with tp.Reconstruction(data, params) as context:
        # Warm-up epoch compiles every XLA program.
        context.iterate(1)
        jax.block_until_ready(context.parameters.psi)
        n_timed = 3
        start = time.perf_counter()
        context.iterate(n_timed)
        jax.block_until_ready(context.parameters.psi)
        elapsed = time.perf_counter() - start

    patterns_per_sec = n_patterns * n_timed / elapsed
    print(
        json.dumps(
            {
                "metric": "rpie_epoch_patterns_per_sec_128px",
                "value": round(patterns_per_sec, 1),
                "unit": "patterns/s",
                "vs_baseline": round(patterns_per_sec / 10_000, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

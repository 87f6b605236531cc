"""Ablate the headline LSQML config to attribute the per-epoch overhead.

Round-5: the full fused LSQML epoch runs at ~21 ms/batch while the batch
math alone measures ~13.5 ms (opbench), so ~7 ms/batch of per-epoch work
(preconditioners, constraints, epoch end) is unattributed. This harness
times the PUBLIC headline path (bench.py's exact shape: 10k x 128^2,
single mode) across ablations:

- num_batch in {5, 10, 20}: epoch time ~= a*nb + b separates per-batch
  cost (a) from per-epoch overhead (b).
- probe recovery off: isolates the probe-update + probe-preconditioner
  share of the overhead.

Run twice to measure the FFT preconditioner formulation (exact, default
off pending this measurement — _preconditioner.py):

    python profile/headline_ablation_tpu.py
    TIKE_FFT_PRECOND=1 python profile/headline_ablation_tpu.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_patterns = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    import jax.numpy as jnp

    import tike_tpu.ptycho as tp
    from tike_tpu.utils import pairs, transfer

    from bench import _make_inputs

    from tike_tpu.ptycho.solvers._preconditioner import USE_FFT_PRECOND

    print(
        f"headline ablation: {n_patterns} patterns, "
        f"fft_precond={USE_FFT_PRECOND} (size-gated per problem)",
        flush=True,
    )
    scan, psi, probe = _make_inputs(n_patterns)
    data = tp.simulate_device(128, probe, scan, psi)
    transfer.scalar(data[0, 0, 0])

    def run(tag, num_batch=10, recover_probe=True):
        params = tp.PtychoParameters(
            probe=probe,
            psi=np.full_like(psi, 0.5),
            scan=scan,
            algorithm_options=tp.LstsqOptions(
                num_batch=num_batch, num_iter=1, batch_method="compact"
            ),
            object_options=tp.ObjectOptions(),
            probe_options=tp.ProbeOptions() if recover_probe else None,
        )
        with tp.Reconstruction(data, params, random_seed=0) as context:
            def sync():
                p = context.parameters.psi
                leaf = p.data if isinstance(p, pairs.Pair) else p
                transfer.scalar(jnp.abs(jnp.asarray(leaf)).sum())

            context.iterate(3)
            sync()
            t0 = time.perf_counter()
            context.iterate(3)
            sync()
            dt = (time.perf_counter() - t0) / 3
        print(
            f"{tag:>42s}: {dt * 1e3:8.1f} ms/epoch "
            f"({n_patterns / dt:8.0f} patterns/s, "
            f"{dt * 1e3 / num_batch:6.2f} ms/batch)",
            flush=True,
        )
        return dt

    t10 = run("lsqml nb=10 (headline)", num_batch=10)
    t5 = run("lsqml nb=5", num_batch=5)
    t20 = run("lsqml nb=20", num_batch=20)
    run("lsqml nb=10 no probe recovery", num_batch=10, recover_probe=False)
    # t(nb) = a*nb + b
    A = np.array([[5, 1], [10, 1], [20, 1]], dtype=np.float64)
    y = np.array([t5, t10, t20])
    (a, b), *_ = np.linalg.lstsq(A, y, rcond=None)
    print(
        f"fit: per-batch {a * 1e3:.2f} ms + per-epoch overhead "
        f"{b * 1e3:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()

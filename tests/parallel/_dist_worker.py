"""Worker for the 2-process (DCN-tier) reconstruction test.

Run as: python _dist_worker.py <rank> <port> <out_prefix>

Mirrors the reference's CI strategy of running the suite under
``mpiexec -n 2`` on one box (`.github/workflows/unit-tests.yml:143`): two
jax.distributed processes on CPU, each with 2 virtual devices, reconstruct
the same problem from per-process data stripes and must agree with each
other and with a single-process run of the same global program.
"""

import os
import sys

import numpy as np


def build_problem():
    """Deterministic synthetic ptychography problem (shared with the test)."""
    import tike_tpu.ptycho as tp

    rng = np.random.default_rng(7)
    h = 96
    p = 16
    psi = np.exp(
        1j * 0.5 * rng.standard_normal((1, h, h)).astype(np.float32)
    ).astype(np.complex64)
    probe = (
        rng.standard_normal((1, 1, 2, p, p))
        + 1j * rng.standard_normal((1, 1, 2, p, p))
    ).astype(np.complex64)
    scan = rng.uniform(2, h - p - 3, size=(60, 2)).astype(np.float32)
    data = tp.simulate(detector_shape=p, probe=probe, scan=scan, psi=psi)
    return data.astype(np.float32), scan, probe, psi.shape


def make_parameters(scan, probe, psi_shape):
    import tike_tpu.ptycho as tp

    return tp.PtychoParameters(
        psi=np.full(psi_shape, 0.8 + 0j, dtype=np.complex64),
        probe=probe,
        scan=scan,
        algorithm_options=tp.RpieOptions(
            num_iter=3, num_batch=3, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(),
    )


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    out = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    # The production entry point: must run before any backend-touching call.
    import tike_tpu.parallel.distributed as dist

    dist.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=rank,
    )
    # Idempotent: a second call detects the attached runtime and no-ops.
    dist.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=rank,
    )
    assert jax.device_count() == 4, jax.device_count()

    import tike_tpu.ptycho as tp

    data, scan, probe, psi_shape = build_problem()
    # Production flow: this process loads only its stripe of the data.
    local_idx = dist.stripe_for_process(scan)
    data_local = data[local_idx]
    params = make_parameters(scan, probe, psi_shape)

    with tp.Reconstruction(
        data=data_local, parameters=params, mesh=dist.global_mesh(),
        random_seed=0,
    ) as context:
        context.iterate(params.algorithm_options.num_iter)
        result = context.get_result()

    np.savez(
        f"{out}.{rank}.npz",
        psi=np.asarray(result.psi),
        probe=np.asarray(result.probe),
        costs=np.asarray(
            [float(np.mean(c)) for c in result.algorithm_options.costs]
        ),
    )
    print(f"rank {rank} done", flush=True)


if __name__ == "__main__":
    main()

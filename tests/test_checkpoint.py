"""Checkpoint round-trip and resume-consistency tests."""

import os
import tempfile

import numpy as np

import tike_tpu.checkpoint
import tike_tpu.ptycho as tp


def _mini_problem(seed=0):
    rng = np.random.default_rng(seed)
    P, HW, N = 16, 96, 60
    yy, xx = np.mgrid[0:HW, 0:HW] / HW
    psi = np.exp(1j * np.sin(5 * yy) * np.cos(3 * xx)).astype(np.complex64)[
        None
    ]
    probe = (tp.gaussian(P) * (1 + 0.2j))[None, None, None].astype(
        np.complex64
    )
    scan = np.stack(
        [rng.uniform(2, HW - P - 3, N), rng.uniform(2, HW - P - 3, N)], -1
    ).astype(np.float32)
    data = tp.simulate(P, probe, scan, psi).astype(np.float32)
    return psi, probe, scan, data


def test_checkpoint_round_trip_and_resume():
    psi, probe, scan, data = _mini_problem()
    params = tp.PtychoParameters(
        probe=probe,
        psi=np.full_like(psi, 0.5),
        scan=scan,
        algorithm_options=tp.RpieOptions(
            num_batch=3, num_iter=3, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(use_adaptive_moment=True),
        probe_options=tp.ProbeOptions(),
        position_options=tp.PositionOptions(scan.copy()),
    )
    result = tp.reconstruct(data, params)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        tike_tpu.checkpoint.save_parameters(path, result)
        loaded = tike_tpu.checkpoint.load_parameters(path)

    # Arrays round-trip exactly.
    np.testing.assert_array_equal(loaded.psi, result.psi)
    np.testing.assert_array_equal(loaded.probe, result.probe)
    np.testing.assert_array_equal(loaded.scan, result.scan)
    # History and options round-trip.
    assert loaded.algorithm_options.costs == result.algorithm_options.costs
    assert (
        loaded.object_options.use_adaptive_moment
        == result.object_options.use_adaptive_moment
    )
    if result.object_options.m is not None:
        np.testing.assert_allclose(
            np.asarray(loaded.object_options.m),
            np.asarray(result.object_options.m),
        )
    # Resuming from the checkpoint continues to reduce cost.
    loaded.algorithm_options.num_iter = 2
    resumed = tp.reconstruct(data, loaded)
    costs = [c[0] for c in resumed.algorithm_options.costs]
    assert len(costs) == 5
    assert costs[-1] <= costs[2] * 1.5  # still sane after resume

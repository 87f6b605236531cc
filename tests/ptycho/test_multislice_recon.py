"""Multislice ptychography reconstruction test.

Analog of the reference's SingersSetup multislice tests
(`tests/ptycho/templates.py:48-88`): simulate a two-slice object and check
rPIE reduces the cost with nslices > 1.
"""

import numpy as np

import tike_tpu.ptycho as tp


def test_rpie_multislice_converges():
    rng = np.random.default_rng(0)
    P, HW, N, D = 16, 96, 120, 2
    yy, xx = np.mgrid[0:HW, 0:HW] / HW
    psi = np.stack(
        [
            np.exp(1j * 0.4 * np.sin(5 * yy) * np.cos(3 * xx)),
            np.exp(1j * 0.3 * np.cos(4 * yy * xx * 7)),
        ]
    ).astype(np.complex64)
    probe = (tp.gaussian(P) * np.exp(1j * 0.1 * tp.gaussian(P)))[
        None, None, None
    ].astype(np.complex64)
    scan = np.stack(
        [rng.uniform(2, HW - P - 3, N), rng.uniform(2, HW - P - 3, N)], -1
    ).astype(np.float32)

    wavelength = 1.4e-10
    fov = (1e-6, 1e-6)
    distance = 2e-8
    data = tp.simulate(
        P,
        probe,
        scan,
        psi,
        probe_wavelength=wavelength,
        probe_FOV_lengths=fov,
        multislice_propagation_distance=distance,
    ).astype(np.float32)

    params = tp.PtychoParameters(
        probe=probe.copy(),
        psi=np.full_like(psi, 0.9),
        scan=scan,
        algorithm_options=tp.RpieOptions(num_batch=3, num_iter=6),
        object_options=tp.ObjectOptions(
            multislice_propagation_distance=distance
        ),
        probe_options=tp.ProbeOptions(
            probe_wavelength=wavelength, probe_FOV_lengths=fov
        ),
    )
    result = tp.reconstruct(data, params)
    costs = [c[0] for c in result.algorithm_options.costs]
    assert np.all(np.isfinite(costs)), costs
    assert costs[-1] < 0.5 * costs[0], costs
    assert result.psi.shape == (D, HW, HW)

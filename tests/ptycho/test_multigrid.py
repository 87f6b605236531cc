"""Multigrid reconstruction tests (`tests/ptycho/test_multigrid.py`)."""

import unittest

import numpy as np

import tike_tpu.ptycho as tp
from tike_tpu.ptycho.solvers.options import (
    _resize_fft,
    crop_fourier_space,
    pad_fourier_space,
)

from .templates import siemens_star_subset


class TestFourierResize(unittest.TestCase):
    def test_crop_then_pad_preserves_low_frequencies(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((3, 32, 32))
             + 1j * rng.standard_normal((3, 32, 32))).astype(np.complex64)
        f = np.fft.fft2(x)
        small = crop_fourier_space(f, 16)
        back = pad_fourier_space(small, 32)
        # Low frequencies (corners) unchanged.
        np.testing.assert_allclose(back[..., :8, :8], f[..., :8, :8])
        np.testing.assert_allclose(back[..., -8:, -8:], f[..., -8:, -8:])

    def test_resize_fft_round_trip(self):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal((2, 16, 16))
             + 1j * rng.standard_normal((2, 16, 16))).astype(np.complex64)
        up = _resize_fft(x, 2.0)
        assert up.shape == (2, 32, 32)
        down = _resize_fft(up, 0.5)
        np.testing.assert_allclose(down, x, rtol=1e-4, atol=1e-5)


class TestMultigrid(unittest.TestCase):
    def setUp(self):
        self.data, self.scan, self.probe, self.psi = siemens_star_subset()

    def test_reconstruct_multigrid(self):
        params = tp.PtychoParameters(
            probe=self.probe.copy(),
            psi=self.psi.copy(),
            scan=self.scan.copy(),
            algorithm_options=tp.RpieOptions(num_batch=5, num_iter=3),
            object_options=tp.ObjectOptions(),
            probe_options=tp.ProbeOptions(),
        )
        result = tp.reconstruct_multigrid(
            data=self.data, parameters=params, num_levels=2
        )
        costs = [c[0] for c in result.algorithm_options.costs]
        assert np.all(np.isfinite(costs)), costs
        # The coarse-to-fine schedule must actually reduce the cost at the
        # finest level (reference runs its full suite through multigrid,
        # `tests/ptycho/test_multigrid.py:62-104`).
        fine = costs[-3:]
        assert fine[-1] < fine[0], costs
        assert result.psi.shape == self.psi.shape
        assert result.probe.shape == self.probe.shape


if __name__ == "__main__":
    unittest.main()


def test_multigrid_striped_object():
    """reconstruct_multigrid composes with object_sharding='striped'
    (the reference's multigrid inherits its implicit multi-GPU psi
    striping at every level)."""
    from tike_tpu.parallel import make_mesh

    data, scan, probe, psi = siemens_star_subset()
    params = tp.PtychoParameters(
        psi=psi,
        probe=probe,
        scan=scan,
        algorithm_options=tp.RpieOptions(
            num_iter=2, num_batch=2, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(
            init_rescale_from_measurements=False
        ),
    )
    result = tp.reconstruct_multigrid(
        data,
        params,
        num_levels=2,
        mesh=make_mesh(),
        object_sharding="striped",
    )
    costs = [float(np.mean(c)) for c in result.algorithm_options.costs]
    assert np.all(np.isfinite(costs))
    assert result.psi.shape == psi.shape

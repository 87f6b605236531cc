"""Alignment driver tests: simulate -> register -> recover known shifts."""

import numpy as np

import tike_tpu.align


def _images(seed=0, n=4, size=64):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size] / size
    base = (
        np.sin(9 * yy[None] * (1 + 0.1 * np.arange(n)[:, None, None]))
        * np.cos(7 * xx[None])
        + 0.3 * rng.random((n, size, size))
    ).astype(np.complex64)
    return base


def test_cross_correlation_recovers_known_shift():
    original = _images()
    true_shift = np.array(
        [[2.5, -1.25], [-3.0, 0.75], [0.0, 4.5], [1.0, -2.0]], np.float32
    )
    unaligned = tike_tpu.align.simulate(
        original,
        shift=true_shift,
        flow=None,
        padded_shape=None,
        angle=None,
    )
    result = tike_tpu.align.reconstruct(
        original=original,
        unaligned=unaligned,
        algorithm="cross_correlation",
        upsample_factor=4,
    )
    # Convention: shift(original, result) ~ unaligned, i.e. the solver
    # returns the shift that was applied.
    np.testing.assert_allclose(result["shift"], true_shift, atol=0.3)


def test_simulate_invert_round_trip():
    original = _images(n=2)
    shift = np.array([[1.5, -0.5], [-1.0, 2.0]], np.float32)
    moved = tike_tpu.align.simulate(
        original, shift=shift, flow=None, padded_shape=None, angle=None
    )
    # invert applies pad.adj(shift.adj(...)) which undoes the pure shift.
    back = tike_tpu.align.invert(
        moved,
        shift=shift,
        flow=None,
        unpadded_shape=None,
        angle=None,
    )
    np.testing.assert_allclose(back, original, rtol=1e-3, atol=1e-4)

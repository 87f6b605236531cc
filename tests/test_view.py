"""Smoke coverage of every plotting function in tike_tpu.view.

The reference's `tests/test_view.py` checks resize/HSV numerics (covered
by `tests/test_misc_modules.py` here); this adds the reference docs'
usage pattern for the full plotting surface — every figure function must
run on representative synthetic inputs under the Agg backend.
"""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")
from matplotlib import pyplot as plt  # noqa: E402

import tike_tpu.view as view  # noqa: E402
from tike_tpu.ptycho.position import AffineTransform  # noqa: E402


@pytest.fixture(autouse=True)
def _close_figures():
    yield
    plt.close("all")


rng = np.random.default_rng(0)


def _probe():
    return (
        rng.standard_normal((1, 1, 3, 16, 16))
        + 1j * rng.standard_normal((1, 1, 3, 16, 16))
    ).astype(np.complex64)


def test_plot_probe_power():
    view.plot_probe_power(_probe())


def test_plot_probe_power_series():
    view.plot_probe_power_series(np.abs(rng.standard_normal((8, 3))))


def test_plot_position_error():
    true = rng.uniform(0, 10, (32, 2))
    view.plot_position_error(true, true + 0.1, indices=np.arange(32))


def test_plot_positions():
    true = rng.uniform(0, 10, (32, 2))
    view.plot_positions(true, true + 0.1)


def test_plot_positions_convergence():
    true = rng.uniform(0, 10, (32, 2))
    view.plot_positions_convergence(true, true + 0.2, true + 0.1)


def test_plot_complex():
    z = (
        rng.standard_normal((16, 16)) + 1j * rng.standard_normal((16, 16))
    ).astype(np.complex64)
    view.plot_complex(z)


def test_plot_phase():
    z = (
        rng.standard_normal((16, 16)) + 1j * rng.standard_normal((16, 16))
    ).astype(np.complex64)
    view.plot_phase(z)


def test_trajectory():
    t = np.linspace(0, 1, 16)
    view.trajectory(np.cos(t), np.sin(t), pause=False)


def test_plot_footprint():
    theta = np.linspace(0, np.pi, 8)
    view.plot_footprint(theta, np.cos(theta), np.sin(theta))


def test_plot_trajectories():
    theta = np.linspace(0, np.pi, 8)
    view.plot_trajectories(theta, np.cos(theta), np.sin(theta), theta)


def test_plot_cost_convergence():
    costs = [np.abs(rng.standard_normal(3)) for _ in range(6)]
    times = np.abs(rng.standard_normal(6))
    view.plot_cost_convergence(costs, times)


def test_plot_eigen_weights():
    view.plot_eigen_weights(rng.standard_normal((64, 2, 3)))


def test_plot_affine_transform():
    view.plot_affine_transform(
        AffineTransform(scale0=1.01, scale1=0.99, shear1=0.01, angle=0.02),
        positions=rng.uniform(0, 10, (32, 2)),
    )


def test_plot_sino_coverage():
    theta = np.linspace(0, np.pi, 16)
    view.plot_sino_coverage(
        theta, np.cos(theta) * 0.2, np.sin(theta) * 0.2
    )

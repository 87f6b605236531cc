"""Row-striped (spatial-parallel) reconstruction on the virtual 8-device mesh.

The TPU analog of the reference's multi-GPU psi decomposition test path:
stripes + halo cross-fade + stitching must reconstruct as well as the
replicated path on the same synthetic data.
"""

import numpy as np
import pytest

import tike_tpu.ptycho as tp
from tike_tpu.parallel import make_mesh
from tike_tpu.parallel.striped import plan_stripes, reconstruct_striped


def _setup(n=512, seed=0, nmodes=1):
    rng = np.random.default_rng(seed)
    P, HW = 16, 160
    yy, xx = np.mgrid[0:HW, 0:HW] / HW
    psi = (
        np.exp(1j * 0.5 * np.sin(5 * yy) * np.cos(3 * xx))
        * (0.9 + 0.1 * np.cos(7 * xx))
    ).astype(np.complex64)[None]
    probe = (tp.gaussian(P) * np.exp(1j * 0.2 * tp.gaussian(P)))[
        None, None, None
    ].astype(np.complex64)
    if nmodes > 1:
        probe = np.asarray(
            tp.add_modes_cartesian_hermite(probe, nmodes)
        ).astype(np.complex64)
    scan = np.stack(
        [rng.uniform(2, HW - P - 3, n), rng.uniform(2, HW - P - 3, n)], -1
    ).astype(np.float32)
    data = tp.simulate(P, probe, scan, psi).astype(np.float32)
    return psi, probe, scan, data


def test_plan_covers_all_positions():
    psi, probe, scan, data = _setup()
    plan = plan_stripes(scan, psi.shape[-2:], probe.shape[-1], 8)
    assert plan.counts.sum() == len(scan)
    assert plan.halo >= probe.shape[-1] + 1
    # every position's window fits inside its local stripe
    local_rows = np.floor(scan[:, 0]) - plan.assignment * plan.stripe_height
    local_rows += plan.halo
    assert (local_rows >= 1).all()
    assert (
        local_rows + probe.shape[-1] + 1 <= plan.local_height
    ).all()


@pytest.mark.slow
def test_striped_reconstruction_matches_replicated():
    psi_true, probe, scan, data = _setup()
    mesh = make_mesh()
    psi0 = np.full_like(psi_true, 0.5)

    psi_striped, probe_s, costs = reconstruct_striped(
        data, psi0, probe, scan, mesh=mesh, num_iter=8
    )
    assert np.isfinite(costs).all()
    assert costs[-1] < costs[0]

    params = tp.PtychoParameters(
        probe=probe.copy(),
        psi=psi0.copy(),
        scan=scan.copy(),
        algorithm_options=tp.RpieOptions(
            num_batch=1, num_iter=8, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(
            init_rescale_from_measurements=False
        ),
    )
    result = tp.reconstruct(data, params)
    ref_costs = [float(np.mean(c)) for c in result.algorithm_options.costs]

    # Striped mode converges comparably (stripes see fewer positions each,
    # so exact equality is not expected).
    assert costs[-1] < 2.0 * max(ref_costs[-1], 1e-3) + 0.05

    # The stitched object agrees with the replicated result over the
    # well-illuminated interior.
    interior = (slice(None), slice(24, -24), slice(24, -24))
    a = np.asarray(psi_striped)[interior]
    b = np.asarray(result.psi)[interior]
    corr = np.abs(np.vdot(a, b)) / (
        np.linalg.norm(a) * np.linalg.norm(b) + 1e-12
    )
    assert corr > 0.95


def test_public_api_striped_lstsq_multimode_matches_replicated():
    """reconstruct(..., object_sharding='striped') with LSQML + 3 modes.

    The striped path must be reachable from the public driver and
    reconstruct as well as the replicated path (VERDICT r1 item 7; the
    reference's object decomposition is its default multi-GPU behavior,
    `ptycho/ptycho.py:371-396,491-502`).
    """
    psi_true, probe, scan, data = _setup(nmodes=3)
    mesh = make_mesh()
    psi0 = np.full_like(psi_true, 0.5)

    def make_params():
        return tp.PtychoParameters(
            probe=probe.copy(),
            psi=psi0.copy(),
            scan=scan.copy(),
            algorithm_options=tp.LstsqOptions(
                num_batch=1, num_iter=6, batch_method="compact"
            ),
            object_options=tp.ObjectOptions(),
            probe_options=tp.ProbeOptions(
                init_rescale_from_measurements=False
            ),
        )

    striped_result = tp.reconstruct(
        data, make_params(), mesh=mesh, object_sharding="striped"
    )
    s_costs = [float(np.mean(c)) for c in striped_result.algorithm_options.costs]
    assert np.isfinite(s_costs).all()
    assert s_costs[-1] < s_costs[0]

    replicated = tp.reconstruct(data, make_params())
    r_costs = [float(np.mean(c)) for c in replicated.algorithm_options.costs]

    assert s_costs[-1] < 2.0 * max(r_costs[-1], 1e-3) + 0.05
    interior = (slice(None), slice(24, -24), slice(24, -24))
    a = np.asarray(striped_result.psi)[interior]
    b = np.asarray(replicated.psi)[interior]
    corr = np.abs(np.vdot(a, b)) / (
        np.linalg.norm(a) * np.linalg.norm(b) + 1e-12
    )
    assert corr > 0.95
    assert striped_result.probe.shape == probe.shape


def test_striped_requires_mesh_and_validates_options():
    psi_true, probe, scan, data = _setup(n=64)
    params = tp.PtychoParameters(
        probe=probe,
        psi=np.full_like(psi_true, 0.5),
        scan=scan,
        algorithm_options=tp.RpieOptions(num_batch=1, num_iter=1),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(),
    )
    import pytest

    with pytest.raises(ValueError, match="requires a mesh"):
        tp.Reconstruction(data, params, object_sharding="striped")
    with pytest.raises(ValueError, match="replicated.*striped|striped"):
        tp.Reconstruction(data, params, object_sharding="bogus")


@pytest.mark.slow
def test_striped_num_batch_chunks_match_single_batch():
    """Chunked (num_batch>1) compact accumulation == one batch per stripe.

    The chunk split only reorders the numerator sums, so rPIE results must
    agree to float tolerance; this is the memory knob for >HBM stripes.
    """
    psi_true, probe, scan, data = _setup(n=256)
    mesh = make_mesh()
    psi0 = np.full_like(psi_true, 0.5)
    a = reconstruct_striped(
        data, psi0, probe, scan, mesh=mesh, num_iter=3, num_batch=1
    )
    b = reconstruct_striped(
        data, psi0, probe, scan, mesh=mesh, num_iter=3, num_batch=4
    )
    np.testing.assert_allclose(a[2], b[2], rtol=1e-4)  # costs
    np.testing.assert_allclose(a[0], b[0], rtol=1e-3, atol=1e-5)  # psi
    np.testing.assert_allclose(a[1], b[1], rtol=1e-3, atol=1e-5)  # probe

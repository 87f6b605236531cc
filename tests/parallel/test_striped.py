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


@pytest.mark.slow
def test_striped_opr_matches_replicated():
    """Striped mode with variable (eigen) probes — full OPR parity.

    The reference runs the complete solver (including OPR) on every GPU
    stripe (`ptycho/ptycho.py:463-525`); striped mode must too (VERDICT r2
    item 1).
    """
    psi_true, probe, scan, data = _setup(nmodes=2)
    mesh = make_mesh()
    psi0 = np.full_like(psi_true, 0.5)
    n = scan.shape[0]
    m = probe.shape[-3]

    def make_params():
        weights = np.zeros((n, 2, m), np.float32)
        weights[:, 0, :] = 1.0
        return tp.PtychoParameters(
            probe=probe.copy(),
            psi=psi0.copy(),
            scan=scan.copy(),
            eigen_probe=0.01 * probe[:, :1, :1].repeat(1, axis=-4),
            eigen_weights=weights,
            algorithm_options=tp.LstsqOptions(
                num_batch=2, num_iter=6, batch_method="compact"
            ),
            object_options=tp.ObjectOptions(),
            probe_options=tp.ProbeOptions(
                init_rescale_from_measurements=False
            ),
        )

    res_s = tp.reconstruct(
        data, make_params(), mesh=mesh, object_sharding="striped"
    )
    s_costs = [float(np.mean(c)) for c in res_s.algorithm_options.costs]
    assert np.isfinite(s_costs).all()
    assert s_costs[-1] < s_costs[0]
    assert res_s.eigen_weights is not None
    assert res_s.eigen_weights.shape == (n, 2, m)
    assert np.all(np.isfinite(res_s.eigen_weights))
    assert res_s.eigen_probe is not None

    res_r = tp.reconstruct(data, make_params())
    r_costs = [float(np.mean(c)) for c in res_r.algorithm_options.costs]
    assert s_costs[-1] < 2.0 * max(r_costs[-1], 1e-3) + 0.05
    interior = (slice(None), slice(24, -24), slice(24, -24))
    a = np.asarray(res_s.psi)[interior]
    b = np.asarray(res_r.psi)[interior]
    corr = np.abs(np.vdot(a, b)) / (
        np.linalg.norm(a) * np.linalg.norm(b) + 1e-12
    )
    assert corr > 0.95


@pytest.mark.slow
def test_striped_position_correction_improves_positions():
    """Striped position correction moves perturbed positions toward truth.

    Matches the reference's per-stripe position updates
    (`lstsq.py:545-579`); positions live local to their stripe, with the
    halo margin absorbing the drift.
    """
    psi_true, probe, scan, data = _setup(n=384)
    rng = np.random.default_rng(7)
    perturbed = scan + rng.uniform(-0.5, 0.5, scan.shape).astype(np.float32)
    mesh = make_mesh()
    psi0 = np.full_like(psi_true, 0.5)

    def run(striped):
        params = tp.PtychoParameters(
            probe=probe.copy(),
            psi=psi0.copy(),
            scan=perturbed.copy(),
            position_options=tp.PositionOptions(
                initial_scan=perturbed,
                update_magnitude_limit=0.2,
            ),
            algorithm_options=tp.LstsqOptions(
                num_batch=2, num_iter=8, batch_method="compact"
            ),
            object_options=tp.ObjectOptions(),
            probe_options=tp.ProbeOptions(
                init_rescale_from_measurements=False
            ),
        )
        kw = (
            dict(mesh=mesh, object_sharding="striped") if striped else {}
        )
        return tp.reconstruct(data, params, **kw)

    res = run(striped=True)
    err1 = np.linalg.norm(res.scan - scan, axis=1).mean()
    # Positions moved, stayed bounded by the per-epoch magnitude limit
    # (no runaway), ...
    moved = np.abs(res.scan - perturbed)
    assert moved.max() > 1e-4
    assert moved.max() < 8 * 0.2 + 1.0, moved.max()
    costs = [float(np.mean(c)) for c in res.algorithm_options.costs]
    assert np.isfinite(costs).all() and costs[-1] < costs[0]
    # ... and the striped path matches the replicated path's position
    # quality (both include the unobservable global-translation drift, so
    # absolute error vs truth is not the right criterion).
    rep = run(striped=False)
    err_rep = np.linalg.norm(rep.scan - scan, axis=1).mean()
    assert err1 < 1.5 * err_rep + 0.1, (err1, err_rep)


def test_striped_position_correction_stays_globally_valid():
    """Position drift never leaves the GLOBAL valid window [1, H - P).

    The first stripe's upper halo and last stripe's lower halo are zero
    padding, not object: the in-program clamp must use per-stripe bounds
    so a near-edge position cannot drift to a globally invalid row (the
    reference errors via check_allowed_positions, `position.py:600-628`).
    Regression: stripe-0 positions used to clamp to local row 1 == global
    row 1 - halo < 1, so `get_result()` returned scan values < 1 and
    `copy_to_host()` raised at context exit.
    """
    from tike_tpu.ptycho.position import check_allowed_positions

    psi_true, probe, scan, data = _setup(n=256)
    P = probe.shape[-1]
    H = psi_true.shape[-2]
    # Pin some positions right at the top and bottom global edges so any
    # inward-biased update pressure pushes them against the bounds.
    scan = scan.copy()
    scan[:12, 0] = np.linspace(1.0, 2.0, 12)
    scan[12:24, 0] = np.linspace(H - P - 2.0, H - P - 1.1, 12)
    data = tp.simulate(P, probe, scan, psi_true).astype(np.float32)
    rng = np.random.default_rng(3)
    perturbed = scan + rng.uniform(-0.7, 0.7, scan.shape).astype(np.float32)
    # The perturbed INPUT must itself be valid; the interesting part is
    # whether the solver's updates keep it that way.
    perturbed[:, 0] = np.clip(perturbed[:, 0], 1.0, H - P - 0.01)
    perturbed[:, 1] = np.clip(perturbed[:, 1], 1.0, H - P - 0.01)
    params = tp.PtychoParameters(
        probe=probe.copy(),
        psi=np.full_like(psi_true, 0.5),
        scan=perturbed,
        position_options=tp.PositionOptions(initial_scan=perturbed),
        algorithm_options=tp.LstsqOptions(num_batch=2, num_iter=6),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(init_rescale_from_measurements=False),
    )
    with tp.Reconstruction(
        data, params, mesh=make_mesh(), object_sharding="striped"
    ) as ctx:
        ctx.iterate(6)
        res = ctx.get_result()
        # Must not raise: every corrected position is globally valid.
        check_allowed_positions(res.scan, res.psi, res.probe.shape)
        # And the context-exit host copy (which re-validates) must work.
        host = ctx.parameters.copy_to_host()
    assert np.isfinite(host.scan).all()


def test_striped_probe_schedule_and_fixed_probe():
    """update_start is honored, and probe_options=None keeps probe fixed.

    Closes the round-2 advisor findings: striped mode used to force probe
    recovery every epoch and ignore the schedule.
    """
    psi_true, probe, scan, data = _setup(n=128)
    mesh = make_mesh()
    psi0 = np.full_like(psi_true, 0.5)

    def make_params(probe_options):
        return tp.PtychoParameters(
            probe=probe.copy(),
            psi=psi0.copy(),
            scan=scan.copy(),
            algorithm_options=tp.RpieOptions(
                num_batch=1, num_iter=2, batch_method="compact"
            ),
            object_options=tp.ObjectOptions(),
            probe_options=probe_options,
        )

    # update_start=5 > num_iter: the probe must come back unchanged.
    res = tp.reconstruct(
        data,
        make_params(
            tp.ProbeOptions(
                init_rescale_from_measurements=False, update_start=5
            )
        ),
        mesh=mesh,
        object_sharding="striped",
    )
    np.testing.assert_allclose(np.asarray(res.probe), probe, atol=1e-6)

    # No probe options at all: also unchanged (previously diverged).
    res2 = tp.reconstruct(
        data,
        make_params(None),
        mesh=mesh,
        object_sharding="striped",
    )
    np.testing.assert_allclose(np.asarray(res2.probe), probe, atol=1e-6)

    # Sanity: with recovery on, the probe does change.
    res3 = tp.reconstruct(
        data,
        make_params(tp.ProbeOptions(init_rescale_from_measurements=False)),
        mesh=mesh,
        object_sharding="striped",
    )
    assert np.max(np.abs(np.asarray(res3.probe) - probe)) > 1e-5


@pytest.mark.slow
def test_striped_measured_pixels_mask():
    """A detector mask (beamstop) is honored in striped mode.

    Previously the user's exitwave_options.measured_pixels was silently
    replaced by an all-True mask (round-2 advisor finding).
    """
    psi_true, probe, scan, data = _setup(n=192)
    det = data.shape[-1]
    mask = np.ones((det, det), bool)
    c = det // 2
    mask[c - 2 : c + 2, c - 2 : c + 2] = False  # central beamstop
    mesh = make_mesh()
    psi0 = np.full_like(psi_true, 0.5)
    params = tp.PtychoParameters(
        probe=probe.copy(),
        psi=psi0.copy(),
        scan=scan.copy(),
        algorithm_options=tp.RpieOptions(
            num_batch=1, num_iter=4, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(init_rescale_from_measurements=False),
        exitwave_options=tp.ExitWaveOptions(
            measured_pixels=mask,
            noise_model="gaussian",
        ),
    )
    res = tp.reconstruct(data, params, mesh=mesh, object_sharding="striped")
    costs = [float(np.mean(c)) for c in res.algorithm_options.costs]
    assert np.isfinite(costs).all()
    assert costs[-1] < costs[0]


@pytest.mark.slow
def test_striped_multislice_rpie_converges():
    """Striped mode with a two-slice object (rPIE multislice).

    The striped windows carry all D slices; the Fresnel inter-slice
    propagation runs per stripe like the replicated fused path.
    """
    rng = np.random.default_rng(0)
    P, HW, N, D = 16, 128, 160, 2
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
    wavelength, fov, distance = 1.4e-10, (1e-6, 1e-6), 2e-8
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
        scan=scan.copy(),
        algorithm_options=tp.RpieOptions(
            num_batch=2, num_iter=6, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(
            multislice_propagation_distance=distance
        ),
        probe_options=tp.ProbeOptions(
            probe_wavelength=wavelength,
            probe_FOV_lengths=fov,
            init_rescale_from_measurements=False,
        ),
    )
    res = tp.reconstruct(
        data, params, mesh=make_mesh(), object_sharding="striped"
    )
    costs = [float(np.mean(c)) for c in res.algorithm_options.costs]
    assert np.all(np.isfinite(costs)), costs
    assert costs[-1] < 0.5 * costs[0], costs
    assert res.psi.shape == (D, HW, HW)
    assert np.all(np.isfinite(res.psi))


def test_striped_empty_stripes_stay_finite():
    """Stripes with no scan positions must not poison the run with NaNs.

    A short object on many devices leaves trailing stripes empty; their
    0/0 preconditioner divisions and degenerate LSQML betas are guarded
    to contribute nothing (the reference's ragged per-GPU stripes simply
    have no such workers).
    """
    rng = np.random.default_rng(0)
    hw, p, npos = 96, 16, 96
    yy, xx = np.mgrid[0:hw, 0:hw] / hw
    psi_true = np.exp(1j * 0.4 * np.sin(5 * yy) * np.cos(3 * xx)).astype(
        np.complex64
    )[None]
    probe = (tp.gaussian(p) * np.exp(1j * 0.2 * tp.gaussian(p)))[
        None, None, None
    ].astype(np.complex64)
    # Positions only in the TOP half: the bottom stripes are empty.
    scan = np.stack(
        [
            rng.uniform(2, hw // 2 - p, npos),
            rng.uniform(2, hw - p - 3, npos),
        ],
        -1,
    ).astype(np.float32)
    data = tp.simulate(p, probe, scan, psi_true).astype(np.float32)
    # Both accumulation modes: compact AND the per-batch (non-compact)
    # updates divide by the empty stripe's all-zero preconditioner.
    for algo in (tp.RpieOptions, tp.LstsqOptions):
        for batch_method in ("compact", "wobbly_center"):
            params = tp.PtychoParameters(
                probe=probe.copy(),
                psi=np.full_like(psi_true, 0.5),
                scan=scan.copy(),
                algorithm_options=algo(
                    num_batch=2, num_iter=2, batch_method=batch_method
                ),
                object_options=tp.ObjectOptions(),
                probe_options=tp.ProbeOptions(
                    init_rescale_from_measurements=False
                ),
            )
            res = tp.reconstruct(
                data, params, mesh=make_mesh(), object_sharding="striped"
            )
            costs = [
                float(np.mean(c)) for c in res.algorithm_options.costs
            ]
            case = (algo.__name__, batch_method)
            assert np.all(np.isfinite(costs)), (case, costs)
            assert np.all(np.isfinite(res.psi)), case
            assert np.all(np.isfinite(res.probe)), case


def test_striped_local_indices_partition():
    """The multi-host data contract partitions the scan across processes.

    Single-process: every position belongs to this (only) process; the
    indices must be ascending, unique, and consistent with plan_stripes'
    assignment for the same geometry (the contract the 2-process worker
    relies on).
    """
    from tike_tpu.parallel.striped import striped_local_indices

    psi, probe, scan, data = _setup(n=128)
    mesh = make_mesh()
    idx = striped_local_indices(
        scan, psi.shape[-2:], probe.shape[-1], mesh
    )
    assert np.array_equal(idx, np.sort(np.unique(idx)))
    # Single process owns every stripe -> every position.
    assert len(idx) == len(scan)


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


def test_striped_position_regularization_matches_replicated(monkeypatch):
    """use_position_regularization runs in striped mode (per-epoch host
    RANSAC fit between 1-epoch chunks) and tracks the replicated path.

    RANSAC subset draws are pinned to a fixed rng on both paths so the
    comparison isolates the striped plumbing, not sampler noise.
    """
    import tike_tpu.ptycho.position as pos

    orig = pos.estimate_global_transformation_ransac

    def pinned(*args, **kwargs):
        kwargs["rng"] = np.random.default_rng(0)
        return orig(*args, **kwargs)

    monkeypatch.setattr(
        pos, "estimate_global_transformation_ransac", pinned
    )

    psi_true, probe, scan, data = _setup(n=256)
    rng = np.random.default_rng(3)
    # A small affine distortion + noise: the regularization's model.
    A = np.array([[1.004, 0.002], [-0.003, 0.998]], np.float32)
    perturbed = (scan @ A.T + rng.uniform(-0.3, 0.3, scan.shape)).astype(
        np.float32
    )
    mesh = make_mesh()
    psi0 = np.full_like(psi_true, 0.5)

    def run(striped):
        params = tp.PtychoParameters(
            probe=probe.copy(),
            psi=psi0.copy(),
            scan=perturbed.copy(),
            position_options=tp.PositionOptions(
                initial_scan=perturbed,
                use_position_regularization=True,
                update_magnitude_limit=0.2,
            ),
            algorithm_options=tp.LstsqOptions(
                num_batch=2, num_iter=6, batch_method="compact"
            ),
            object_options=tp.ObjectOptions(),
            probe_options=tp.ProbeOptions(
                init_rescale_from_measurements=False
            ),
        )
        kw = (
            dict(mesh=mesh, object_sharding="striped") if striped else {}
        )
        # random_seed pins the batch clustering so the near-threshold
        # position-recovery assertions below are deterministic.
        with tp.Reconstruction(data, params, random_seed=0, **kw) as ctx:
            ctx.iterate(params.algorithm_options.num_iter)
            return ctx.get_result()

    res_s = run(striped=True)
    res_r = run(striped=False)

    costs_s = [float(np.mean(c)) for c in res_s.algorithm_options.costs]
    costs_r = [float(np.mean(c)) for c in res_r.algorithm_options.costs]
    assert np.isfinite(costs_s).all() and costs_s[-1] < costs_s[0]
    # Same physics: both converge to noise level (the per-epoch solver
    # path and the fused striped program are different-but-equivalent
    # update orders, so exact cost equality is not expected).
    assert costs_s[-1] < 0.01 * costs_s[0], (costs_s[0], costs_s[-1])
    assert costs_s[-1] < 5 * costs_r[-1] + 1e-5, (costs_s[-1], costs_r[-1])
    # Position recovery toward the TRUE positions (the paths take
    # different-but-equivalent update orders, so compare each to truth
    # rather than to each other).
    err0 = np.median(np.linalg.norm(perturbed - scan, axis=1))
    err_s = np.median(np.linalg.norm(res_s.scan - scan, axis=1))
    err_r = np.median(np.linalg.norm(res_r.scan - scan, axis=1))
    assert err_s < 1.5 * err_r + 0.05, (err0, err_s, err_r)
    assert err_s < 0.95 * err0, (err_s, err0)
    # The fitted global transforms agree.
    ts = res_s.position_options.transform.asarray()
    tr = res_r.position_options.transform.asarray()
    np.testing.assert_allclose(ts, tr, atol=5e-3)


def test_estimate_probe_rescale_multihost_matches_and_composes():
    """The multi-host rescale estimator reduces to the single-host one when
    this process owns every row, and disjoint per-process partial measured
    powers compose to the full scale (scale^2 is linear in measured power,
    so sqrt(s0^2 + s1^2) must equal the full-data scale)."""
    from tike_tpu.parallel.striped import (
        estimate_probe_rescale,
        estimate_probe_rescale_multihost,
    )

    psi, probe, scan, data = _setup(n=200)
    n = scan.shape[0]

    s_full = estimate_probe_rescale(
        data, psi, probe, scan, rng=np.random.default_rng(5)
    )
    s_all = estimate_probe_rescale_multihost(
        data,
        np.arange(n),
        psi,
        probe,
        scan,
        rng=np.random.default_rng(5),
    )
    np.testing.assert_allclose(s_all, s_full, rtol=1e-12)

    half = np.arange(n // 2)
    other = np.arange(n // 2, n)
    s0 = estimate_probe_rescale_multihost(
        data[half], half, psi, probe, scan, rng=np.random.default_rng(5)
    )
    s1 = estimate_probe_rescale_multihost(
        data[other], other, psi, probe, scan, rng=np.random.default_rng(5)
    )
    np.testing.assert_allclose(
        np.sqrt(s0**2 + s1**2), s_full, rtol=1e-6
    )


@pytest.mark.parametrize("algo", ["rpie", "lstsq"])
def test_striped_streamed_matches_fused(algo):
    """store_data_on_device=False streams batches from host RAM through
    the same epoch math as the fused striped program (>HBM data composed
    with the >HBM object decomposition); results must match the fused
    path closely."""
    psi_true, probe, scan, data = _setup(n=256, nmodes=2)
    mesh = make_mesh()
    psi0 = np.full_like(psi_true, 0.5)
    n, m = scan.shape[0], probe.shape[-3]

    def run(on_device):
        algo_cls = tp.RpieOptions if algo == "rpie" else tp.LstsqOptions
        kwargs = {}
        if algo == "lstsq":
            weights = np.zeros((n, 2, m), np.float32)
            weights[:, 0, :] = 1.0
            kwargs["eigen_probe"] = 0.01 * probe[:, :1, :1]
            kwargs["eigen_weights"] = weights
            kwargs["position_options"] = tp.PositionOptions(
                initial_scan=scan, update_magnitude_limit=0.2
            )
        params = tp.PtychoParameters(
            probe=probe.copy(),
            psi=psi0.copy(),
            scan=scan.copy(),
            algorithm_options=algo_cls(
                num_batch=3, num_iter=3, batch_method="compact"
            ),
            object_options=tp.ObjectOptions(),
            probe_options=tp.ProbeOptions(
                init_rescale_from_measurements=False
            ),
            **kwargs,
        )
        with tp.Reconstruction(
            data,
            params,
            mesh=mesh,
            object_sharding="striped",
            random_seed=0,
            store_data_on_device=on_device,
        ) as ctx:
            ctx.iterate(params.algorithm_options.num_iter)
            return ctx.get_result()

    res_f = run(on_device=True)
    res_s = run(on_device=False)

    costs_f = [float(np.mean(c)) for c in res_f.algorithm_options.costs]
    costs_s = [float(np.mean(c)) for c in res_s.algorithm_options.costs]
    np.testing.assert_allclose(costs_s, costs_f, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res_s.psi), np.asarray(res_f.psi), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_s.probe),
        np.asarray(res_f.probe),
        rtol=1e-3,
        atol=1e-5,
    )
    if algo == "lstsq":
        np.testing.assert_allclose(
            res_s.scan, res_f.scan, rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(res_s.eigen_weights),
            np.asarray(res_f.eigen_weights),
            rtol=1e-3,
            atol=1e-5,
        )


def test_striped_constant_probe_photons_matches_replicated():
    """rescale_method='constant_probe_photons' works in striped mode and
    tracks the replicated fused path (reference applies the rescale with
    the start-of-epoch constraints, `ptycho/ptycho.py:783-795`)."""
    psi_true, probe, scan, data = _setup(n=256)
    mesh = make_mesh()
    psi0 = np.full_like(psi_true, 0.5)

    def run(striped):
        params = tp.PtychoParameters(
            probe=probe.copy(),
            psi=psi0.copy(),
            scan=scan.copy(),
            algorithm_options=tp.RpieOptions(
                num_batch=2,
                num_iter=4,
                batch_method="compact",
                rescale_method="constant_probe_photons",
                rescale_period=2,
            ),
            object_options=tp.ObjectOptions(),
            probe_options=tp.ProbeOptions(
                init_rescale_from_measurements=False,
                probe_photons=float(np.sum(np.abs(probe) ** 2)),
            ),
        )
        kw = (
            dict(mesh=mesh, object_sharding="striped") if striped else {}
        )
        with tp.Reconstruction(data, params, random_seed=0, **kw) as ctx:
            ctx.iterate(params.algorithm_options.num_iter)
            return ctx.get_result()

    res_s = run(striped=True)
    res_r = run(striped=False)
    costs_s = [float(np.mean(c)) for c in res_s.algorithm_options.costs]
    costs_r = [float(np.mean(c)) for c in res_r.algorithm_options.costs]
    assert np.isfinite(costs_s).all()
    assert costs_s[-1] < costs_s[0]
    assert costs_s[-1] < 2.0 * max(costs_r[-1], 1e-3) + 0.05
    np.testing.assert_allclose(
        np.sum(np.abs(np.asarray(res_s.probe)) ** 2),
        np.sum(np.abs(np.asarray(res_r.probe)) ** 2),
        rtol=0.05,
    )


@pytest.mark.parametrize("stream", [False, True])
def test_striped_classical_momentum_runs(stream):
    """Striped mode with lstsq classical momentum (obj adaptive moment +
    non-compact batches): regression for the shard_map spec crash when
    obj_v stays a rank-0 scalar ('momentum' allocates only obj_m)."""
    psi_true, probe, scan, data = _setup(n=128)
    mesh = make_mesh()
    params = tp.PtychoParameters(
        probe=probe.copy(),
        psi=np.full_like(psi_true, 0.5),
        scan=scan.copy(),
        algorithm_options=tp.LstsqOptions(
            num_batch=2, num_iter=2, batch_method="wobbly_center"
        ),
        object_options=tp.ObjectOptions(use_adaptive_moment=True),
        probe_options=tp.ProbeOptions(
            init_rescale_from_measurements=False
        ),
    )
    with tp.Reconstruction(
        data,
        params,
        mesh=mesh,
        object_sharding="striped",
        store_data_on_device=not stream,
        random_seed=0,
    ) as ctx:
        ctx.iterate(2)
        result = ctx.get_result()
    costs = [float(np.mean(c)) for c in result.algorithm_options.costs]
    assert np.all(np.isfinite(costs)) and costs[-1] < costs[0], costs


def test_striped_streamed_chunking_invariant(monkeypatch):
    """The K-batches-per-dispatch chunking (TIKE_STREAM_CHUNK) leaves the
    streamed result unchanged: K=1 (the pre-chunking per-batch dispatch),
    K=2 (one chunk + a single-batch tail), and the default all give the
    same reconstruction. VERDICT r3 item 6."""
    psi_true, probe, scan, data = _setup(n=192, nmodes=1)
    mesh = make_mesh()
    psi0 = np.full_like(psi_true, 0.5)

    def run(chunk):
        if chunk is None:
            monkeypatch.delenv("TIKE_STREAM_CHUNK", raising=False)
        else:
            monkeypatch.setenv("TIKE_STREAM_CHUNK", str(chunk))
        params = tp.PtychoParameters(
            probe=probe.copy(),
            psi=psi0.copy(),
            scan=scan.copy(),
            algorithm_options=tp.RpieOptions(
                num_batch=3, num_iter=2, batch_method="compact"
            ),
            object_options=tp.ObjectOptions(),
            probe_options=tp.ProbeOptions(
                init_rescale_from_measurements=False
            ),
        )
        with tp.Reconstruction(
            data,
            params,
            mesh=mesh,
            object_sharding="striped",
            random_seed=0,
            store_data_on_device=False,
        ) as ctx:
            ctx.iterate(2)
            return ctx.get_result()

    base = run(1)
    base_costs = [float(np.mean(c)) for c in base.algorithm_options.costs]
    for chunk in (2, None):
        other = run(chunk)
        np.testing.assert_allclose(
            [float(np.mean(c)) for c in other.algorithm_options.costs],
            base_costs,
            rtol=1e-6,
            err_msg=f"chunk={chunk}",
        )
        np.testing.assert_allclose(
            np.asarray(other.psi),
            np.asarray(base.psi),
            rtol=1e-5,
            atol=1e-6,
            err_msg=f"chunk={chunk}",
        )
        np.testing.assert_allclose(
            np.asarray(other.probe),
            np.asarray(base.probe),
            rtol=1e-5,
            atol=1e-6,
            err_msg=f"chunk={chunk}",
        )

"""Multi-device data-parallel reconstruction tests on a virtual CPU mesh.

Replaces the reference's communicator tests (`tests/communicators/`): instead
of checking hand-written collectives, we check that a reconstruction sharded
over an 8-device mesh produces the same result as the single-device run —
the collectives are XLA's responsibility.
"""

import numpy as np
import pytest

import jax

import tike_tpu.ptycho as tp
from tike_tpu.parallel import make_mesh, batch_sharding, replicated_sharding


def _setup(seed=0, n=96):
    rng = np.random.default_rng(seed)
    P, HW = 16, 96
    yy, xx = np.mgrid[0:HW, 0:HW] / HW
    psi = (
        np.exp(1j * 0.5 * np.sin(5 * yy) * np.cos(3 * xx))
        * (0.9 + 0.1 * np.cos(7 * xx))
    ).astype(np.complex64)[None]
    probe = (tp.gaussian(P) * np.exp(1j * 0.2 * tp.gaussian(P)))[
        None, None, None
    ].astype(np.complex64)
    scan = np.stack(
        [rng.uniform(2, HW - P - 3, n), rng.uniform(2, HW - P - 3, n)], -1
    ).astype(np.float32)
    data = tp.simulate(P, probe, scan, psi).astype(np.float32)
    return psi, probe, scan, data


def _params(psi, probe, scan, num_iter=3):
    return tp.PtychoParameters(
        probe=probe.copy(),
        psi=np.full_like(psi, 0.5),
        scan=scan.copy(),
        algorithm_options=tp.RpieOptions(
            num_batch=3, num_iter=num_iter, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(),
    )


def test_mesh_sharded_matches_single_device():
    psi, probe, scan, data = _setup()
    mesh = make_mesh()
    assert mesh.size == 8, "conftest should provide 8 virtual devices"

    rng_seed = 42
    r_single = tp.reconstruct(
        data, _params(psi, probe, scan), mesh=None
    )
    r_mesh = tp.reconstruct(data, _params(psi, probe, scan), mesh=mesh)

    c_single = [c[0] for c in r_single.algorithm_options.costs]
    c_mesh = [c[0] for c in r_mesh.algorithm_options.costs]
    # compact batching is deterministic given the kmeans seeding; costs can
    # differ only through clustering randomness, so compare loosely: both
    # must converge to similar cost.
    assert np.isfinite(c_mesh).all()
    assert c_mesh[-1] < c_mesh[0]
    np.testing.assert_allclose(c_mesh[-1], c_single[-1], rtol=0.5)
    # psi results similar in magnitude distribution
    np.testing.assert_allclose(
        np.abs(r_mesh.psi).mean(), np.abs(r_single.psi).mean(), rtol=0.1
    )


def test_sharding_specs():
    mesh = make_mesh()
    rs = replicated_sharding(mesh)
    bs = batch_sharding(mesh, axis=1)
    x = jax.device_put(np.zeros((4, 16, 8, 8), np.float32), bs)
    assert x.sharding == bs
    # Each device holds a (4, 2, 8, 8) slice.
    shard_shape = x.sharding.shard_shape(x.shape)
    assert shard_shape == (4, 2, 8, 8)
    y = jax.device_put(np.zeros((8, 8), np.float32), rs)
    assert y.sharding.is_fully_replicated


def test_swap_edges_halo_blend():
    """Halo blend matches a single-host computation of the same cross-fade.

    Equivalent check to the reference's `test_swap_edges`
    (`tests/communicators/test_pool.py:143`).
    """
    from tike_tpu.parallel.halo import swap_edges, _blend_ramp

    mesh = make_mesh()
    ndev = mesh.size
    overlap = 3
    rows_per = 8
    H = rows_per * ndev
    rng = np.random.default_rng(0)
    psi = (
        rng.standard_normal((1, H, 16)) + 1j * rng.standard_normal((1, H, 16))
    ).astype(np.complex64)

    sharded = jax.device_put(
        psi, batch_sharding(mesh, axis=1)
    )
    out = np.asarray(swap_edges(sharded, mesh, overlap))

    # Host reference: for each internal seam, device i's bottom rows are
    # blended into device i+1's top rows and vice versa.
    want = psi.copy()
    ramp = np.asarray(_blend_ramp(overlap))[None, :, None]
    for i in range(ndev):
        lo = i * rows_per
        if i > 0:
            above_bot = psi[:, lo - overlap : lo, :]
            mine_top = psi[:, lo : lo + overlap, :]
            want[:, lo : lo + overlap, :] = (
                (1 - ramp) * above_bot + ramp * mine_top
            )
        if i < ndev - 1:
            below_top = psi[:, lo + rows_per : lo + rows_per + overlap, :]
            mine_bot = psi[:, lo + rows_per - overlap : lo + rows_per, :]
            want[:, lo + rows_per - overlap : lo + rows_per, :] = (
                (1 - ramp[:, ::-1]) * below_top + ramp[:, ::-1] * mine_bot
            )
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_mesh_fused_lstsq():
    """The fused LSQML program runs sharded and reduces cost."""
    psi, probe, scan, data = _setup()
    mesh = make_mesh()
    params = tp.PtychoParameters(
        probe=probe.copy(),
        psi=np.full_like(psi, 0.5),
        scan=scan.copy(),
        algorithm_options=tp.LstsqOptions(
            num_batch=3, num_iter=3, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(),
    )
    with tp.Reconstruction(
        data=data, parameters=params, mesh=mesh, random_seed=1
    ) as context:
        assert context._fused_eligible()
        context.iterate(3)
        result = context.get_result()
    costs = [float(np.mean(c)) for c in result.algorithm_options.costs]
    assert np.isfinite(costs).all()
    assert costs[-1] < costs[0]

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

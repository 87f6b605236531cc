"""Joint ptycho-tomography ADMM pipeline test.

Equivalent in spirit to the reference's legacy `profile/profile_admm.py`
workload (the `src/broken/` ADMM): simulate multi-angle ptychography of a 3D
object and check the joint reconstruction runs and reduces cost.
"""

import numpy as np
import pytest

import tike_tpu.admm
import tike_tpu.lamino
import tike_tpu.ptycho as tp
from tike_tpu.constants import wavenumber
from tike_tpu.ops.lamino import LaminoConfig, lamino_fwd

import jax.numpy as jnp


@pytest.mark.slow
def test_joint_admm_runs_and_reduces_cost():
    rng = np.random.default_rng(0)
    n, P, T, NPOS = 32, 8, 4, 40
    energy = 10.0
    voxelsize = 1e-7
    k = wavenumber(energy)

    # A weak-phase 3D object: delta chosen so k * voxelsize * path ~ 0.5 rad
    # (k is in 1/cm, voxelsize in cm).
    delta = 0.5 / (k * voxelsize * 12)
    obj = np.zeros((n, n, n), dtype=np.complex64)
    obj[10:22, 10:22, 10:22] = delta * (1 + 0.1j)
    theta = np.linspace(0, np.pi, T, endpoint=False).astype(np.float32)

    # Ground-truth projections -> per-angle transmission psi.
    cfg = LaminoConfig(n=n, tilt=np.pi / 2, eps=1e-3, upsample=2)
    lines = (
        np.asarray(lamino_fwd(cfg, jnp.asarray(obj), jnp.asarray(theta)))
        * voxelsize
    )
    psi_true = np.exp(1j * k * lines).astype(np.complex64)

    probe = (tp.gaussian(P) * (1 + 0j))[None, None, None].astype(np.complex64)
    scan = np.stack(
        [rng.uniform(2, n - P - 3, NPOS), rng.uniform(2, n - P - 3, NPOS)],
        -1,
    ).astype(np.float32)

    data = [
        tp.simulate(P, probe, scan, psi_true[t][None]).astype(np.float32)
        for t in range(T)
    ]
    params = [
        tp.PtychoParameters(
            probe=probe.copy(),
            psi=np.ones((1, n, n), np.complex64),
            scan=scan.copy(),
            algorithm_options=tp.RpieOptions(num_batch=2, num_iter=2),
            object_options=tp.ObjectOptions(),
            probe_options=None,
        )
        for _ in range(T)
    ]

    result = tike_tpu.admm.reconstruct_joint_admm(
        data,
        params,
        theta,
        tilt=np.pi / 2,
        voxelsize=voxelsize,
        energy=energy,
        num_iter=8,
        rho=0.5,
        ptycho_iter=2,
        lamino_iter=2,
    )
    costs = result["costs"]
    assert np.all(np.isfinite(costs)), costs
    assert costs[-1] < costs[0], costs
    # Monotone descent across 8 iterations (16 cumulative ptycho epochs):
    # regression guard for the mid-run object rescale that desynced the
    # consensus variables and made the iteration diverge at epoch 10.
    assert all(b < a * 1.05 for a, b in zip(costs, costs[1:])), costs
    assert result["obj"].shape == (n, n, n)

"""ADMM joint ptycho-tomography QUALITY regression tests (VERDICT r3 items 4/8).

Pins the 16-angle volume-correlation figures from `scripts/admm_quality.py`
so a quality regression is visible in CI, not just a cost decrease:

- sharp-edged weak-phase cube (the regime that stalled at corr 0.70 in
  round 3): coverage-weighted blend + rho=2 reaches 0.907 at 24 iterations
  (ceiling 0.990); pinned at 0.88.
- smooth blobs: 0.963 at 12 iterations, rho=0.5 (ceiling 0.998; the naive
  two-step pipeline measures 0.907); pinned at 0.93.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import tike_tpu.admm
import tike_tpu.lamino
import tike_tpu.ptycho as tp
from tike_tpu.constants import wavenumber
from tike_tpu.ops.lamino import LaminoConfig, lamino_fwd


def _corr(a, b):
    a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
    return float(
        np.abs(np.vdot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b))
    )


def _setup(phantom, n=48, T=16, P=16, NPOS=150):
    energy, voxelsize = 10.0, 1e-7
    k = wavenumber(energy)
    rng = np.random.default_rng(0)
    delta = 0.5 / (k * voxelsize * n / 2)
    obj_true = np.zeros((n, n, n), dtype=np.complex64)
    if phantom == "cube":
        s = slice(n // 4, 3 * n // 4)
        obj_true[s, s, s] = delta * (1 + 0.1j)
    else:
        yy, xx, zz = np.mgrid[0:n, 0:n, 0:n] / n - 0.5
        for cy, cx, cz, r, w in [
            (-0.15, 0.1, 0.0, 0.22, 1.0),
            (0.18, -0.12, 0.08, 0.15, 0.7),
            (0.0, 0.15, -0.18, 0.10, 1.3),
        ]:
            blob = np.exp(
                -(((yy - cy) ** 2 + (xx - cx) ** 2 + (zz - cz) ** 2) / r**2)
                * 4
            )
            obj_true += (w * delta * (1 + 0.1j) * blob).astype(np.complex64)
    theta = np.linspace(0, np.pi, T, endpoint=False).astype(np.float32)
    cfg = LaminoConfig(n=n, tilt=np.pi / 2, eps=1e-3, upsample=2)
    lines = (
        np.asarray(lamino_fwd(cfg, jnp.asarray(obj_true), jnp.asarray(theta)))
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
    return obj_true, theta, data, params, voxelsize, energy


@pytest.mark.slow
@pytest.mark.parametrize(
    "phantom,num_iter,rho,pinned",
    [("cube", 24, 2.0, 0.88), ("blobs", 12, 0.5, 0.93)],
)
def test_admm_volume_correlation_pinned(phantom, num_iter, rho, pinned):
    obj_true, theta, data, params, voxelsize, energy = _setup(phantom)
    result = tike_tpu.admm.reconstruct_joint_admm(
        data, params, theta,
        tilt=np.pi / 2, voxelsize=voxelsize, energy=energy,
        num_iter=num_iter, rho=rho, ptycho_iter=2, lamino_iter=2,
    )
    c = _corr(result["obj"], obj_true)
    costs = result["costs"]
    assert np.all(np.isfinite(costs)) and costs[-1] < costs[0], costs
    assert c >= pinned, (phantom, c)


@pytest.mark.slow
def test_admm_coverage_weighting_lifts_sharp_phantom():
    """The coverage-weighted blend is the measured quality lever on the
    sharp phantom (0.70 unweighted -> 0.84 at 12 iterations, rho=0.5);
    guard the mechanism, not just the end figure."""
    obj_true, theta, data, params, voxelsize, energy = _setup("cube")
    kw = dict(
        tilt=np.pi / 2, voxelsize=voxelsize, energy=energy,
        num_iter=8, rho=1.0, ptycho_iter=2, lamino_iter=2,
    )
    import copy

    weighted = tike_tpu.admm.reconstruct_joint_admm(
        data, copy.deepcopy(params), theta, coverage_weighted=True, **kw
    )
    unweighted = tike_tpu.admm.reconstruct_joint_admm(
        data, copy.deepcopy(params), theta, coverage_weighted=False, **kw
    )
    cw = _corr(weighted["obj"], obj_true)
    cu = _corr(unweighted["obj"], obj_true)
    assert cw > cu + 0.03, (cw, cu)

#!/usr/bin/env python
"""ADMM joint ptycho-tomography QUALITY experiment (VERDICT r3 item 4).

Measures volume correlation vs ground truth for the joint ADMM pipeline
(`tike_tpu/admm.py`, re-derived from the reference's legacy
`src/broken/tike.py:87-178`) in the weak-phase / few-angle regime, and the
pure-laminography ceiling (reconstructing directly from the TRUE projections)
for the same geometry, which bounds what the joint pipeline can achieve.

Run:

    python scripts/admm_quality.py [n] [T] [iters] [rho] [phantom] [gauge]

Defaults: n=48, T=16 angles, 12 ADMM iterations, rho=0.5, phantom=blobs.
phantom=cube reproduces the sharp-edged weak-phase cube regime from the
round-3 bench (`bench_all.py::bench_admm_joint`) where quality stalled.
Prints one JSON line with {admm_corr, ceiling_corr, costs} so runs are
comparable.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corr(a, b):
    a = a.ravel()
    b = b.ravel()
    na = np.linalg.norm(a)
    nb = np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.abs(np.vdot(a, b)) / (na * nb))


def setup_problem(phantom, n=48, T=16, P=16, NPOS=150):
    """Build the benchmark problem (shared with tests/test_admm_quality.py).

    Returns (obj_true, theta, psi_true, data, params, voxelsize, energy).
    Weak-phase 3D phantom: a blobby object (band-limited; corr is a
    meaningful structure metric) or a sharp-edged cube (the regime that
    stalled at corr 0.70 in round 3). Max line integral ~ n/2 voxels.
    """
    import jax.numpy as jnp

    import tike_tpu.ptycho as tp
    from tike_tpu.constants import wavenumber
    from tike_tpu.ops.lamino import LaminoConfig, lamino_fwd

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
    return obj_true, theta, psi_true, data, params, voxelsize, energy


def main():
    import jax

    platform = os.environ.get("TIKE_DEMO_PLATFORM", "cpu")
    try:
        jax.config.update("jax_platforms", platform)
    except RuntimeError:
        pass

    import tike_tpu.admm
    import tike_tpu.lamino
    import tike_tpu.ptycho as tp
    from tike_tpu.constants import wavenumber

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    rho = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    phantom = sys.argv[5] if len(sys.argv) > 5 else "blobs"
    gauge = sys.argv[6] if len(sys.argv) > 6 else "target"
    P = 16
    k = wavenumber(10.0)

    (obj_true, theta, psi_true, data, params,
     voxelsize, energy) = setup_problem(phantom, n=n, T=T, P=P)

    # Ceiling: pure lamino CG from the TRUE phase projections
    # (psi_true = exp(i k voxelsize phi_true), |phase| < pi so exact).
    phi_true = (np.angle(psi_true) / (k * voxelsize)).astype(np.complex64)
    ceil = tike_tpu.lamino.reconstruct(
        data=phi_true, theta=theta, tilt=np.pi / 2,
        algorithm="cgrad", num_iter=32, eps=1e-3, upsample=2,
    )
    ceiling_corr = corr(np.asarray(ceil["obj"]), obj_true)
    scan = params[0].scan

    t0 = time.perf_counter()
    result = tike_tpu.admm.reconstruct_joint_admm(
        data, params, theta,
        tilt=np.pi / 2, voxelsize=voxelsize, energy=energy,
        num_iter=iters, rho=rho, ptycho_iter=2, lamino_iter=2,
        gauge=gauge,
    )
    elapsed = time.perf_counter() - t0
    admm_corr = corr(np.asarray(result["obj"]), obj_true)

    # Also: corr of a standalone-ptycho + lamino two-step (no ADMM coupling)
    # as the naive pipeline baseline the ADMM must beat.
    probe = params[0].probe
    phi_est = []
    for t in range(T):
        p = tp.PtychoParameters(
            probe=probe.copy(),
            psi=np.ones((1, n, n), np.complex64),
            scan=scan.copy(),
            algorithm_options=tp.RpieOptions(
                num_batch=2, num_iter=2 * iters
            ),
            object_options=tp.ObjectOptions(),
            probe_options=None,
        )
        p = tp.reconstruct(data[t], p)
        psi_t = np.asarray(p.psi)[0]
        phi_est.append(np.angle(psi_t) / (k * voxelsize))
    phi_est = np.asarray(phi_est, dtype=np.complex64)
    twostep = tike_tpu.lamino.reconstruct(
        data=phi_est, theta=theta, tilt=np.pi / 2,
        algorithm="cgrad", num_iter=32, eps=1e-3, upsample=2,
    )
    twostep_corr = corr(np.asarray(twostep["obj"]).real, obj_true.real)

    print(json.dumps({
        "n": n, "T": T, "iters": iters, "rho": rho, "phantom": phantom,
        "gauge": gauge,
        "admm_corr": round(admm_corr, 4),
        "twostep_corr": round(twostep_corr, 4),
        "ceiling_corr": round(ceiling_corr, 4),
        "admm_sec": round(elapsed, 1),
        "costs": [round(c, 6) for c in result["costs"]],
    }), flush=True)


if __name__ == "__main__":
    main()

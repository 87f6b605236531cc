#!/usr/bin/env python
"""On-chip smoke test of the public API surface (relay-safe boundaries).

The tunneled TPU relay forbids complex arrays at program boundaries and has
shifting op support, so "works on CPU" does not imply "works on the chip".
This script drives every public workload and the standalone utility surface
end-to-end on whatever backend is attached (a few seconds each at tiny
sizes) and prints one OK/FAIL line per area. Run:

    python scripts/chip_smoke.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

FAILURES = []


def check(name):
    def deco(fn):
        t0 = time.perf_counter()
        try:
            fn()
            print(f"OK   {name} ({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:
            FAILURES.append(name)
            print(
                f"FAIL {name}: {type(e).__name__}: {str(e)[:140]}",
                flush=True,
            )
        return fn

    return deco


rng = np.random.default_rng(0)


@check("ptycho reconstruct (rpie, fused)")
def _ptycho():
    import tike_tpu.ptycho as tp

    h, p, n = 96, 16, 96
    yy, xx = np.mgrid[0:h, 0:h] / h
    psi = np.exp(1j * 0.4 * np.sin(5 * yy) * np.cos(3 * xx)).astype(
        np.complex64
    )[None]
    probe = (tp.gaussian(p) * np.exp(1j * 0.2 * tp.gaussian(p)))[
        None, None, None
    ].astype(np.complex64)
    scan = np.stack(
        [rng.uniform(2, h - p - 3, n), rng.uniform(2, h - p - 3, n)], -1
    ).astype(np.float32)
    data = tp.simulate(p, probe, scan, psi).astype(np.float32)
    params = tp.PtychoParameters(
        probe=probe,
        psi=np.full_like(psi, 0.5),
        scan=scan,
        algorithm_options=tp.RpieOptions(
            num_batch=2, num_iter=3, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(),
    )
    result = tp.reconstruct(data, params)
    costs = [float(np.mean(c)) for c in result.algorithm_options.costs]
    assert np.all(np.isfinite(costs)) and costs[-1] < costs[0], costs


@check("ptycho striped (fused + host-streamed, 1-device mesh)")
def _striped():
    import tike_tpu.ptycho as tp
    from tike_tpu.parallel import make_mesh

    h, p, n = 96, 16, 96
    yy, xx = np.mgrid[0:h, 0:h] / h
    psi = np.exp(1j * 0.4 * np.sin(5 * yy) * np.cos(3 * xx)).astype(
        np.complex64
    )[None]
    probe = (tp.gaussian(p) * np.exp(1j * 0.2 * tp.gaussian(p)))[
        None, None, None
    ].astype(np.complex64)
    scan = np.stack(
        [rng.uniform(2, h - p - 3, n), rng.uniform(2, h - p - 3, n)], -1
    ).astype(np.float32)
    data = tp.simulate(p, probe, scan, psi).astype(np.float32)
    mesh = make_mesh(1)
    for stream in (False, True):
        params = tp.PtychoParameters(
            probe=probe.copy(),
            psi=np.full_like(psi, 0.5),
            scan=scan.copy(),
            algorithm_options=tp.RpieOptions(
                num_batch=2,
                num_iter=3,
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
        with tp.Reconstruction(
            data,
            params,
            mesh=mesh,
            object_sharding="striped",
            store_data_on_device=not stream,
            random_seed=0,
        ) as ctx:
            ctx.iterate(3)
            result = ctx.get_result()
        costs = [float(np.mean(c)) for c in result.algorithm_options.costs]
        assert np.all(np.isfinite(costs)) and costs[-1] < costs[0], (
            stream,
            costs,
        )


@check("ptycho multigrid")
def _multigrid():
    import tike_tpu.ptycho as tp

    h, p, n = 96, 16, 64
    yy, xx = np.mgrid[0:h, 0:h] / h
    psi = np.exp(1j * 0.4 * np.sin(5 * yy) * np.cos(3 * xx)).astype(
        np.complex64
    )[None]
    probe = (tp.gaussian(p) * np.exp(1j * 0.2 * tp.gaussian(p)))[
        None, None, None
    ].astype(np.complex64)
    scan = np.stack(
        [rng.uniform(4, h - p - 5, n), rng.uniform(4, h - p - 5, n)], -1
    ).astype(np.float32)
    data = tp.simulate(p, probe, scan, psi).astype(np.float32)
    params = tp.PtychoParameters(
        probe=probe,
        psi=np.full_like(psi, 0.5),
        scan=scan,
        algorithm_options=tp.RpieOptions(
            num_batch=2, num_iter=2, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(),
    )
    result = tp.reconstruct_multigrid(data, params, num_levels=2)
    costs = [float(np.mean(c)) for c in result.algorithm_options.costs]
    assert np.all(np.isfinite(costs)), costs


@check("lamino cgrad (KB USFFT)")
def _lamino():
    import tike_tpu.lamino

    n = 32
    obj = (
        rng.standard_normal((n, n, n)) + 1j * rng.standard_normal((n, n, n))
    ).astype(np.complex64) * np.exp(
        -((np.mgrid[0:n, 0:n, 0:n] - n / 2) ** 2).sum(0) / (n / 3) ** 2
    )
    theta = np.linspace(0, np.pi, 8, endpoint=False).astype(np.float32)
    data = tike_tpu.lamino.simulate(obj, theta, np.pi / 3, eps=1e-3)
    res = tike_tpu.lamino.reconstruct(
        data, theta, np.pi / 3, algorithm="cgrad", num_iter=3
    )
    assert res["cost"][-1] < res["cost"][0], res["cost"]


@check("lamino bucket")
def _bucket():
    import tike_tpu.lamino.bucket as tlb

    n = 16
    obj = (
        rng.standard_normal((n, n, n)) + 1j * rng.standard_normal((n, n, n))
    ).astype(np.complex64)
    theta = np.linspace(0, np.pi, 8, endpoint=False).astype(np.float32)
    data = tlb.simulate(obj, theta, np.pi / 2, eps=1.0)
    res = tlb.reconstruct(
        data, theta, np.pi / 2, algorithm="bucket", num_iter=2, eps=1.0
    )
    assert res["cost"][-1] < res["cost"][0], res["cost"]


@check("align cross-correlation + invert")
def _align():
    import tike_tpu.align as ta

    n, h = 4, 64
    yy, xx = np.mgrid[0:h, 0:h] / h
    base = np.stack(
        [
            np.exp(1j * np.sin((5 + k) * yy * 2 * np.pi))
            * (0.6 + 0.4 * np.cos((7 + k) * xx * yy))
            for k in range(n)
        ]
    ).astype(np.complex64)
    shift = np.array(
        [[2.5, -1.25], [-3.0, 0.75], [0.0, 4.5], [1.0, -2.0]], np.float32
    )
    un = ta.simulate(
        base, shift=shift, flow=None, padded_shape=None, angle=None
    )
    res = ta.reconstruct(
        original=base,
        unaligned=un,
        algorithm="cross_correlation",
        upsample_factor=4,
    )
    assert np.abs(res["shift"] - shift).max() < 0.3, res["shift"]
    ta.invert(
        un,
        shift=shift,
        flow=None,
        padded_shape=None,
        unpadded_shape=None,
        angle=None,
    )


@check("admm joint pipeline")
def _admm():
    from tike_tpu.admm import reconstruct_joint_admm
    import tike_tpu.ptycho as tp

    n, P, T, NPOS = 32, 8, 4, 40
    theta = np.linspace(0, np.pi, T, endpoint=False).astype(np.float32)
    probe = (tp.gaussian(P) * np.exp(1j * 0.1 * tp.gaussian(P)))[
        None, None, None
    ].astype(np.complex64)
    scan = np.stack(
        [rng.uniform(2, n - P - 3, NPOS), rng.uniform(2, n - P - 3, NPOS)],
        -1,
    ).astype(np.float32)
    yy, xx = np.mgrid[0:n, 0:n] / n
    psi0 = np.exp(1j * 0.1 * np.sin(5 * yy) * np.cos(3 * xx)).astype(
        np.complex64
    )[None]
    data, params = [], []
    for _ in range(T):
        data.append(tp.simulate(P, probe, scan, psi0).astype(np.float32))
        params.append(
            tp.PtychoParameters(
                probe=probe.copy(),
                psi=np.full_like(psi0, 1.0),
                scan=scan.copy(),
                algorithm_options=tp.RpieOptions(
                    num_batch=1, num_iter=1, batch_method="compact"
                ),
                object_options=tp.ObjectOptions(),
                probe_options=tp.ProbeOptions(
                    init_rescale_from_measurements=False
                ),
            )
        )
    out = reconstruct_joint_admm(
        data,
        params,
        theta,
        tilt=np.pi / 2,
        num_iter=1,
        ptycho_iter=1,
        lamino_iter=1,
    )
    costs = np.asarray(out["costs"], np.float64)
    assert np.all(np.isfinite(costs)), costs


@check("probe/object standalone utilities")
def _utils():
    import tike_tpu.ptycho as tp
    import tike_tpu.ptycho.object as obj_mod
    from tike_tpu.ptycho.learn import extract_patches
    from tike_tpu.ptycho.probe import power

    p = 32
    probe = (
        rng.standard_normal((1, 1, 1, p, p))
        + 1j * rng.standard_normal((1, 1, 1, p, p))
    ).astype(np.complex64)
    m = np.asarray(tp.add_modes_cartesian_hermite(probe, 3))
    a = np.asarray(tp.adjust_probe_power(m))
    o, pwr = tp.orthogonalize_eig(a)
    c = np.asarray(tp.constrain_center_peak(np.asarray(o)))
    sp = np.asarray(tp.constrain_probe_sparsity(c, 0.5))
    np.asarray(tp.apply_median_filter_abs_probe(sp, med_filt_px=(2.0, 2.0)))
    power(sp)
    psi = (
        rng.standard_normal((1, 64, 64)) + 1j * rng.standard_normal((1, 64, 64))
    ).astype(np.complex64)
    obj_mod.positivity_constraint(psi, r=0.5)
    obj_mod.smoothness_constraint(psi, a=0.1)
    obj_mod.clip_magnitude(psi, a_max=1.0)
    scan = np.stack(
        [rng.uniform(2, 40, 10), rng.uniform(2, 40, 10)], -1
    ).astype(np.float32)
    extract_patches(psi[0], scan, 16)


if __name__ == "__main__":
    if FAILURES:
        print(f"\n{len(FAILURES)} FAILURES: {FAILURES}")
        sys.exit(1)
    print("\nall chip smoke checks passed")

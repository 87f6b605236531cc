"""Benchmark every BASELINE.json config on the attached TPU chip.

Usage: python bench_all.py [config ...]
  configs: rpie_siemens lsqml_opr_pos lamino_cgrad admm_joint stream_1m
  (default: all but stream_1m, which is slow to generate; run it explicitly
   or via scripts/longaxis_demo.py)

Writes one JSON line per config to stdout and appends the results to
BENCH_CONFIGS.json. `bench.py` remains the driver's single-line headline
benchmark; this file covers the full BASELINE.md config table:

1. rpie_siemens   - single-probe rPIE on the bundled siemens-star dataset
                    (516 positions, 128^2 measured patterns).
2. lsqml_opr_pos  - multi-mode (3 probes) + eigen-probe LSQML with probe
                    and position correction, 10k synthetic 128^2 patterns.
3. lamino_cgrad   - laminography USFFT conjugate-gradient, 128^3 volume,
                    single tilt angle.
4. admm_joint     - joint ptycho+lamino ADMM pipeline (legacy src/broken
                    workload re-derived in tike_tpu.admm).
5. stream_1m      - data-parallel long-axis config: 1M patterns in
                    host-streaming mode (see also scripts/longaxis_demo.py).

FLOP estimates (for the MFU column) count the FFT-dominated hot path:
a complex 2D FFT of N=DET^2 points costs ~5 N log2 N real FLOPs; each
pattern does one forward and one adjoint FFT per probe mode plus ~15 DET^2
elementwise FLOPs and the patch-op selection matmuls (~2 * 8 * P^2 complex
MACs per pattern at tile width 8). These are useful-work FLOPs, not
executed-instruction counts, so the MFU number is conservative.
"""

import bz2
import json
import resource
import sys
import time

import numpy as np

# v5e (TPU v5 lite) peak: ~197 TFLOP/s bf16, ~49 TFLOP/s f32.
PEAK_F32 = 49e12


def _flops_per_pattern(det: int, p: int, nmodes: int) -> float:
    fft = 5.0 * det * det * np.log2(det * det)
    elementwise = 15.0 * det * det
    patch = 2 * 8 * p * p * 8  # fwd+adj selection matmuls, 8 flops/cmac
    return 2 * nmodes * fft + elementwise + nmodes * patch


def _siemens_path():
    import os
    local = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "data", "siemens-star-small.npz.bz2",
    )
    if os.path.isfile(local):
        return local
    return "/root/reference/tests/data/siemens-star-small.npz.bz2"


def _siemens():
    with bz2.open(
        _siemens_path(), "rb"
    ) as f:
        a = np.load(f)
        scan = a["scan"][0].astype(np.float32)
        data = a["data"][0].astype(np.float32)
        probe = a["probe"][0].astype(np.complex64)
    scan = scan - np.amin(scan, axis=-2) + 20
    w = probe.shape[-1]
    h = int(np.ceil(scan[:, 0].max())) + w + 21
    ww = int(np.ceil(scan[:, 1].max())) + w + 21
    psi = np.full((1, h, ww), 0.5 + 0j, dtype=np.complex64)
    return data, scan, probe, psi


def _timed_epochs(context, n_timed: int):
    """Time n_timed epochs after an identically-shaped warmup call."""
    import jax.numpy as jnp

    from tike_tpu.utils import pairs, transfer

    def _sync():
        # block_until_ready does not actually block on the relay; force a
        # real host transfer of a scalar. psi is a Pair in relay pair mode.
        psi = context.parameters.psi
        leaf = psi.data if isinstance(psi, pairs.Pair) else psi
        transfer.scalar(jnp.abs(jnp.asarray(leaf)).sum())

    context.iterate(n_timed)
    _sync()
    start = time.perf_counter()
    context.iterate(n_timed)
    _sync()
    return time.perf_counter() - start


def bench_rpie_siemens():
    import tike_tpu.ptycho as tp

    data, scan, probe, psi = _siemens()
    params = tp.PtychoParameters(
        probe=probe,
        psi=psi,
        scan=scan,
        algorithm_options=tp.RpieOptions(
            num_batch=5, num_iter=1, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(),
    )
    n_timed = 10
    with tp.Reconstruction(data, params, random_seed=0) as context:
        elapsed = _timed_epochs(context, n_timed)
        costs = [float(np.mean(c)) for c in context.get_convergence()[0]]
    pps = len(scan) * n_timed / elapsed
    fl = _flops_per_pattern(data.shape[-1], probe.shape[-1], 1)
    return {
        "config": "rpie_siemens",
        "metric": "rpie_siemens_patterns_per_sec",
        "value": round(pps, 1),
        "unit": "patterns/s",
        "epoch_s": round(elapsed / n_timed, 4),
        "final_cost": costs[-1],
        "est_tflops": round(pps * fl / 1e12, 3),
        "est_mfu_f32_pct": round(100 * pps * fl / PEAK_F32, 2),
    }


def bench_lsqml_opr_pos(n_patterns=10_000):
    import tike_tpu.ptycho as tp
    from bench import _simulate_numpy

    det = probe_shape = 128
    hw = 1500
    rng = np.random.default_rng(0)
    scan = np.stack(
        [
            rng.uniform(2, hw - probe_shape - 3, n_patterns),
            rng.uniform(2, hw - probe_shape - 3, n_patterns),
        ],
        -1,
    ).astype(np.float32)
    base = (
        tp.gaussian(probe_shape)
        * np.exp(1j * 0.2 * tp.gaussian(probe_shape))
    )[None, None, None].astype(np.complex64)
    probe = np.asarray(tp.add_modes_cartesian_hermite(base, 3)).astype(
        np.complex64
    )
    yy, xx = np.mgrid[0:hw, 0:hw] / hw
    psi = (
        np.exp(1j * 0.5 * np.sin(17 * yy) * np.cos(13 * xx))
        * (0.9 + 0.1 * np.cos(23 * xx * yy))
    ).astype(np.complex64)[None]
    data = _simulate_numpy(det, probe, scan, psi)

    m = probe.shape[-3]
    eigen_probe = 0.01 * probe[:, :1].repeat(1, axis=-4)
    weights = np.zeros((n_patterns, 2, m), np.float32)
    weights[:, 0, :] = 1.0
    params = tp.PtychoParameters(
        probe=probe,
        psi=np.full_like(psi, 0.5),
        scan=scan,
        eigen_probe=eigen_probe.astype(np.complex64),
        eigen_weights=weights,
        algorithm_options=tp.LstsqOptions(
            num_batch=10, num_iter=1, batch_method="compact"
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(),
        position_options=tp.PositionOptions(
            initial_scan=scan, update_magnitude_limit=2.0
        ),
    )
    n_timed = 3
    with tp.Reconstruction(data, params, random_seed=0) as context:
        assert context._fused_eligible(), "config 2 must run fused"
        elapsed = _timed_epochs(context, n_timed)
    pps = n_patterns * n_timed / elapsed
    fl = _flops_per_pattern(det, probe_shape, 3)
    return {
        "config": "lsqml_opr_pos",
        "metric": "lsqml_3mode_eigen_pos_patterns_per_sec_128px",
        "value": round(pps, 1),
        "unit": "patterns/s",
        "epoch_s": round(elapsed / n_timed, 4),
        "vs_north_star_10k": round(pps / 10_000, 3),
        "est_tflops": round(pps * fl / 1e12, 3),
        "est_mfu_f32_pct": round(100 * pps * fl / PEAK_F32, 2),
    }


def bench_lamino_cgrad(n=128, ntheta=64):
    import jax
    import jax.numpy as jnp

    import tike_tpu.lamino

    rng = np.random.default_rng(0)
    obj = (
        rng.standard_normal((n, n, n)) + 1j * rng.standard_normal((n, n, n))
    ).astype(np.complex64) * np.exp(
        -((np.mgrid[0:n, 0:n, 0:n] - n / 2) ** 2).sum(0) / (n / 3) ** 2
    )
    theta = np.linspace(0, np.pi, ntheta, endpoint=False).astype(np.float32)
    tilt = np.pi / 3
    data = tike_tpu.lamino.simulate(obj, theta, tilt, eps=1e-3, upsample=1)

    # Warmup: 1 iteration compiles the cost/grad programs.
    tike_tpu.lamino.reconstruct(
        data, theta, tilt, algorithm="cgrad", num_iter=1, upsample=1
    )
    n_timed = 5
    start = time.perf_counter()
    result = tike_tpu.lamino.reconstruct(
        data, theta, tilt, algorithm="cgrad", num_iter=n_timed, upsample=1
    )
    elapsed = time.perf_counter() - start
    return {
        "config": "lamino_cgrad",
        "metric": "lamino_cgrad_128cubed_sec_per_iter",
        "value": round(elapsed / n_timed, 4),
        "unit": "s/iter",
        "ntheta": ntheta,
        "final_cost": float(result["cost"][-1]),
    }


def bench_admm_joint(n=64, P=16, T=8, NPOS=200):
    import jax.numpy as jnp

    import tike_tpu.admm
    import tike_tpu.ptycho as tp
    from tike_tpu.constants import wavenumber
    from tike_tpu.ops.lamino import LaminoConfig, lamino_fwd_p

    rng = np.random.default_rng(0)
    energy, voxelsize = 10.0, 1e-7
    k = wavenumber(energy)
    delta = 0.5 / (k * voxelsize * n / 2)
    obj = np.zeros((n, n, n), dtype=np.complex64)
    s = slice(n // 4, 3 * n // 4)
    obj[s, s, s] = delta * (1 + 0.1j)
    theta = np.linspace(0, np.pi, T, endpoint=False).astype(np.float32)
    cfg = LaminoConfig(n=n, tilt=np.pi / 2, eps=1e-3, upsample=2)
    from tike_tpu.utils.pairs import download, upload

    lines = download(
        lamino_fwd_p(cfg, upload(obj, dtype=np.complex64),
                     jnp.asarray(theta, dtype=np.float32))
    ) * voxelsize
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
    parameters = [
        tp.PtychoParameters(
            psi=np.ones((1, n, n), np.complex64),
            probe=probe.copy(),
            scan=scan.copy(),
            algorithm_options=tp.RpieOptions(num_batch=1, num_iter=1),
            object_options=tp.ObjectOptions(),
            probe_options=tp.ProbeOptions(
                init_rescale_from_measurements=False
            ),
        )
        for _ in range(T)
    ]
    # Warmup iteration compiles everything.
    out = tike_tpu.admm.reconstruct_joint_admm(
        data, parameters, theta, voxelsize=voxelsize, energy=energy,
        num_iter=1, ptycho_iter=2, lamino_iter=2,
    )
    n_timed = 3
    start = time.perf_counter()
    out = tike_tpu.admm.reconstruct_joint_admm(
        data, out["parameters"], theta, obj=out["obj"],
        voxelsize=voxelsize, energy=energy,
        num_iter=n_timed, ptycho_iter=2, lamino_iter=2,
    )
    elapsed = time.perf_counter() - start
    return {
        "config": "admm_joint",
        "metric": "admm_joint_sec_per_iter",
        "value": round(elapsed / n_timed, 4),
        "unit": "s/iter",
        "angles": T,
        "positions_per_angle": NPOS,
        "final_cost": float(out["costs"][-1]),
    }


def bench_stream_1m(n_patterns=1_000_000, det=64):
    """Long-axis demo: host-resident data streamed batch-by-batch."""
    import tike_tpu.ptycho as tp

    rng = np.random.default_rng(0)
    hw = 4096
    scan = np.stack(
        [
            rng.uniform(2, hw - det - 3, n_patterns),
            rng.uniform(2, hw - det - 3, n_patterns),
        ],
        -1,
    ).astype(np.float32)
    probe = (tp.gaussian(det) * np.exp(1j * 0.1 * tp.gaussian(det)))[
        None, None, None
    ].astype(np.complex64)
    # Throughput/memory demo: physically-plausible random data suffices.
    data = rng.random((n_patterns, det, det), np.float32)
    psi = np.full((1, hw, hw), 0.5 + 0j, np.complex64)
    params = tp.PtychoParameters(
        probe=probe,
        psi=psi,
        scan=scan,
        algorithm_options=tp.RpieOptions(
            # Clustering layouts are O(N*num_batch) on the host; at 1M
            # positions only the random partition is affordable.
            num_batch=100,
            num_iter=1,
            batch_method="random",
        ),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(
            init_rescale_from_measurements=False
        ),
    )
    with tp.Reconstruction(
        data, params, store_data_on_device=False, random_seed=0
    ) as context:
        assert isinstance(context.data, np.ndarray), "must be host-resident"
        start = time.perf_counter()
        context.iterate(1)
        elapsed = time.perf_counter() - start
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    return {
        "config": "stream_1m",
        "metric": "stream_1m_patterns_per_sec",
        "value": round(n_patterns / elapsed, 1),
        "unit": "patterns/s",
        "epoch_s": round(elapsed, 2),
        "host_data_gb": round(data.nbytes / 2**30, 2),
        "peak_rss_gb": round(peak_rss_gb, 2),
    }


def bench_stream_compare(n_patterns=100_000, det=64):
    """Device-resident vs host-streamed throughput at the same size.

    VERDICT r4 item 6: config 5's 1M-pattern number benchmarks the dev
    tunnel (~25 MB/s uploads), not the streaming pipeline. At 100k x 64²
    the dataset (1.6 GB) still fits HBM, so the same problem can run both
    ways on-chip: the delta isolates what host-streaming itself costs when
    the host link is NOT the bottleneck (device-resident) vs when it is.
    """
    import jax
    import jax.numpy as jnp

    import tike_tpu.ptycho as tp
    from tike_tpu.utils import pairs, transfer

    rng = np.random.default_rng(0)
    hw = 4096
    scan = np.stack(
        [
            rng.uniform(2, hw - det - 3, n_patterns),
            rng.uniform(2, hw - det - 3, n_patterns),
        ],
        -1,
    ).astype(np.float32)
    probe = (tp.gaussian(det) * np.exp(1j * 0.1 * tp.gaussian(det)))[
        None, None, None
    ].astype(np.complex64)
    psi = np.full((1, hw, hw), 0.5 + 0j, np.complex64)

    def fresh_params():
        return tp.PtychoParameters(
            probe=probe.copy(),
            psi=psi.copy(),
            scan=scan.copy(),
            algorithm_options=tp.RpieOptions(
                num_batch=10, num_iter=1, batch_method="random"
            ),
            object_options=tp.ObjectOptions(),
            probe_options=tp.ProbeOptions(
                init_rescale_from_measurements=False
            ),
        )

    def timed(data, on_device):
        with tp.Reconstruction(
            data,
            fresh_params(),
            store_data_on_device=on_device,
            random_seed=0,
        ) as context:
            def sync():
                p = context.parameters.psi
                leaf = p.data if isinstance(p, pairs.Pair) else p
                transfer.scalar(jnp.abs(jnp.asarray(leaf)).sum())

            context.iterate(1)  # warm-up: compile
            sync()
            start = time.perf_counter()
            context.iterate(2)
            sync()
            return (time.perf_counter() - start) / 2

    # Device-resident arm: data born on-chip (random suffices for
    # throughput; nothing crosses the tunnel).
    data_dev = jax.random.uniform(
        jax.random.PRNGKey(0), (n_patterns, det, det), jnp.float32
    )
    dev_s = timed(data_dev, on_device=True)
    del data_dev
    # Host-streamed arm: same shapes, data stays in host RAM and each
    # mini-batch uploads through the tunnel (double-buffered).
    data_host = rng.random((n_patterns, det, det)).astype(np.float32)
    host_s = timed(data_host, on_device=False)

    return {
        "config": "stream_compare",
        "metric": "stream100k_device_resident_patterns_per_sec",
        "value": round(n_patterns / dev_s, 1),
        "unit": "patterns/s",
        "host_streamed_patterns_per_sec": round(n_patterns / host_s, 1),
        "device_epoch_s": round(dev_s, 2),
        "host_epoch_s": round(host_s, 2),
        "n_patterns": n_patterns,
    }


def bench_lamino_cgls(n=128, ntheta=64):
    """CGLS variant of config 3: same problem, optimal-step linear CG.

    Beyond-reference solver (`lamino/solvers/cgls.py`): one fwd + one
    exact-adjoint per inner step, no backtracking cost evaluations.
    Reported alongside (not replacing) the cgrad config so round-over-
    round comparability of config 3 is preserved.
    """
    import tike_tpu.lamino

    rng = np.random.default_rng(0)
    obj = (
        rng.standard_normal((n, n, n)) + 1j * rng.standard_normal((n, n, n))
    ).astype(np.complex64) * np.exp(
        -((np.mgrid[0:n, 0:n, 0:n] - n / 2) ** 2).sum(0) / (n / 3) ** 2
    )
    theta = np.linspace(0, np.pi, ntheta, endpoint=False).astype(np.float32)
    tilt = np.pi / 3
    data = tike_tpu.lamino.simulate(obj, theta, tilt, eps=1e-3, upsample=1)

    tike_tpu.lamino.reconstruct(
        data, theta, tilt, algorithm="cgls", num_iter=1, upsample=1
    )
    n_timed = 5
    start = time.perf_counter()
    result = tike_tpu.lamino.reconstruct(
        data, theta, tilt, algorithm="cgls", num_iter=n_timed, upsample=1
    )
    elapsed = time.perf_counter() - start
    return {
        "config": "lamino_cgls",
        "metric": "lamino_cgls_128cubed_sec_per_iter",
        "value": round(elapsed / n_timed, 4),
        "unit": "s/iter",
        "ntheta": ntheta,
        "final_cost": float(np.asarray(result["cost"])[-1]),
    }


BENCHES = {
    "rpie_siemens": bench_rpie_siemens,
    "lsqml_opr_pos": bench_lsqml_opr_pos,
    "lamino_cgrad": bench_lamino_cgrad,
    "lamino_cgls": bench_lamino_cgls,
    "admm_joint": bench_admm_joint,
    "stream_1m": bench_stream_1m,
    "stream_compare": bench_stream_compare,
}


def main():
    import jax
    import jax.numpy as jnp

    names = sys.argv[1:] or [
        "rpie_siemens",
        "lsqml_opr_pos",
        "lamino_cgrad",
        "admm_joint",
    ]
    # Tiny warmup op stabilizes the tunneled backend's cold compiler.
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    results = []
    for name in names:
        print(f"# running {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        out = BENCHES[name]()
        out["bench_wall_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(out), flush=True)
        results.append(out)
    try:
        # Merge by config name so partial runs accumulate.
        try:
            with open("BENCH_CONFIGS.json") as f:
                merged = {
                    r["config"]: r for r in json.load(f).get("results", [])
                }
        except (OSError, ValueError):
            merged = {}
        merged.update({r["config"]: r for r in results})
        with open("BENCH_CONFIGS.json", "w") as f:
            json.dump(
                {
                    "device": str(jax.devices()[0]),
                    "results": list(merged.values()),
                },
                f,
                indent=1,
            )
    except OSError:
        pass


if __name__ == "__main__":
    main()

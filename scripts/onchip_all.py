#!/usr/bin/env python
"""Run every pending on-chip measurement in one relay-alive window.

The tunneled TPU relay wedges for long stretches (see ROUND3/4 notes), and
— critically — killing a client mid-program (SIGTERM during an in-flight
TPU call) is itself a reliable way to wedge it. So this orchestrator:

- is jax-free in the parent (import jax can hang when the relay is wedged);
- probes the relay cheaply (45 s child) before each job and between
  retries, so a wedge costs a probe, not a job timeout;
- runs the jobs SEQUENTIALLY in subprocesses with generous timeouts sized
  to each job's real runtime, never two at once (one host core, and the
  relay serializes programs anyway);
- logs each job's stdout+stderr to /root/repo/profile/onchip/<name>.log and
  prints a one-line OK/FAIL summary at the end.

Usage: python scripts/onchip_all.py [job ...]
  jobs (default order): bench chip_smoke pallas_probe roofline opbench bench_all
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGDIR = os.path.join(ROOT, "profile", "onchip")

# name -> (argv, timeout_s)
JOBS = {
    "bench": ([sys.executable, "bench.py"], 900),
    "chip_smoke": ([sys.executable, "scripts/chip_smoke.py"], 1500),
    "pallas_probe": ([sys.executable, "scripts/pallas_probe.py"], 900),
    "roofline": ([sys.executable, "profile/roofline_tpu.py", "1000", "16"], 1200),
    "opbench": ([sys.executable, "profile/opbench_tpu.py", "1000", "8"], 1200),
    "lamino_breakdown": (
        [sys.executable, "profile/lamino_breakdown_tpu.py", "64", "8"],
        1200,
    ),
    "hbm_ceiling": ([sys.executable, "profile/hbm_ceiling_tpu.py"], 1800),
    "headline_ablation": (
        [sys.executable, "profile/headline_ablation_tpu.py"],
        2400,
    ),
    "headline_ablation_fftpre": (
        [sys.executable, "profile/headline_ablation_tpu.py"],
        2400,
        {"TIKE_FFT_PRECOND": "1"},
    ),
    "stream_compare": (
        [sys.executable, "bench_all.py", "stream_compare"],
        2400,
    ),
    "patch_stage": (
        [sys.executable, "profile/patch_stage_tpu.py", "1000", "16"],
        1200,
    ),
    "rpie_variance": (
        # config 1 back-to-back x3: run-to-run spread of the
        # dispatch-dominated 16 ms epoch (VERDICT r4 item 3).
        [
            sys.executable, "bench_all.py",
            "rpie_siemens", "rpie_siemens", "rpie_siemens",
        ],
        2400,
    ),
    "bench_all": (
        [
            sys.executable,
            "bench_all.py",
            "rpie_siemens",
            "lsqml_opr_pos",
            "lamino_cgrad",
            "admm_joint",
        ],
        2400,
    ),
}
# Highest-value first: relay-alive windows are short (6-15 min observed),
# so the driver-metric bench, the roofline attribution, and the Pallas
# compile probe must land before the longer smoke/bench_all sweeps.
DEFAULT_ORDER = [
    "bench",
    "roofline",
    "pallas_probe",
    "opbench",
    "bench_all",
    "chip_smoke",
]

_PROBE_CODE = (
    "import jax, jax.numpy as jnp, numpy as np;"
    "x = np.asarray(jax.device_get(jnp.ones((8, 128)) @ jnp.ones((128, 8))));"
    "print('RELAY_OK', float(x.sum()), flush=True)"
)


def probe_relay(timeout=None):
    # Cold-but-alive relay: first tiny program observed at ~110 s (remote
    # compiler spin-up); a 45 s timeout misclassified that as wedged. On a
    # CPU-contended box even jax import takes ~60 s, so the timeout is
    # env-tunable (ONCHIP_PROBE_TIMEOUT_S).
    if timeout is None:
        timeout = float(os.environ.get("ONCHIP_PROBE_TIMEOUT_S", 240))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and "RELAY_OK" in proc.stdout


def wait_for_relay(max_wait_s):
    deadline = time.monotonic() + max_wait_s
    n = 0
    while time.monotonic() < deadline:
        n += 1
        if probe_relay():
            return True
        print(
            f"[onchip] relay wedged (probe {n}); retry in 60 s",
            flush=True,
        )
        time.sleep(60)
    return False


def job_succeeded(name, rc, log):
    """rc==0 plus job-specific sanity: bench exits 0 even on total failure
    (it emits an error JSON record so the driver never sees rc=124), so
    its success test is a real value in the final JSON line."""
    if rc != 0:
        return False
    if name in ("bench", "bench_all"):
        try:
            with open(log) as fh:
                lines = [ln for ln in fh if ln.startswith("{")]
            if not lines:
                return False
            import json

            recs = [json.loads(ln) for ln in lines]
            return all(
                "error" not in r and r.get("value", 0) > 0 for r in recs
            )
        except Exception:
            return False
    return True


def main():
    os.makedirs(LOGDIR, exist_ok=True)
    # Persistent compile cache for every job child: a retry after a wedge
    # should not repay remote compiles (no-op where the backend can't
    # serialize executables).
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tike_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    names = sys.argv[1:] or DEFAULT_ORDER
    max_wait = float(os.environ.get("ONCHIP_MAX_WAIT_S", 1800))
    total_s = float(os.environ.get("ONCHIP_TOTAL_S", 9 * 3600))
    deadline = time.monotonic() + total_s
    results = {}
    pending = list(names)
    round_no = 0
    # Retry failed jobs in rounds until everything passed or time is up:
    # the relay alternates alive/wedged on minute-to-hour scales, so a
    # one-pass schedule loses whole jobs to a single wedge.
    last_success_at = 0.0
    while pending and time.monotonic() < deadline:
        round_no += 1
        still_pending = []
        for name in pending:
            argv, timeout, *rest = JOBS[name]
            env = dict(os.environ, **rest[0]) if rest else None
            # Skip the probe when a job just succeeded: the relay is
            # demonstrably alive, and a fresh probe process costs ~110 s
            # of the (short) alive window on cold-start alone.
            if time.monotonic() - last_success_at > 120 and not wait_for_relay(
                min(max_wait, deadline - time.monotonic())
            ):
                results[name] = "PENDING (relay down)"
                still_pending.append(name)
                continue
            log = os.path.join(LOGDIR, f"{name}.log")
            print(f"[onchip] r{round_no} running {name} -> {log}", flush=True)
            t0 = time.perf_counter()
            with open(log, "w") as fh:
                try:
                    proc = subprocess.run(
                        argv, stdout=fh, stderr=subprocess.STDOUT,
                        timeout=timeout, cwd=ROOT, env=env,
                    )
                    rc = proc.returncode
                except subprocess.TimeoutExpired:
                    rc = "TIMEOUT"
            dt = time.perf_counter() - t0
            ok = job_succeeded(name, rc, log)
            results[name] = f"rc={rc} ({dt:.0f}s){' OK' if ok else ' RETRY'}"
            print(
                f"[onchip] r{round_no} {name}: rc={rc} in {dt:.0f}s "
                f"{'OK' if ok else 'will retry'}",
                flush=True,
            )
            if ok:
                last_success_at = time.monotonic()
            else:
                still_pending.append(name)
        if still_pending == pending and round_no > 1:
            # Nothing progressed this round; back off before the next.
            time.sleep(120)
        pending = still_pending
    print("[onchip] ==== summary ====", flush=True)
    for name, r in results.items():
        print(f"[onchip] {name}: {r}", flush=True)


if __name__ == "__main__":
    main()

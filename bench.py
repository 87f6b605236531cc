"""Benchmark: rPIE/LSQML epoch throughput on the BASELINE.json config.

North-star metric (BASELINE.md): diffraction patterns per second per chip for
one solver epoch over 10k 128x128 patterns (128x128 probe). Baseline target is
10,000 patterns/s (1 epoch < 1 s on one chip); vs_baseline = value / 10000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Structured to fit the driver's ~900 s envelope (VERDICT r3 item 1):

- The parent process is jax-free (the tunneled TPU backend can wedge so hard
  that ``import jax`` hangs at interpreter start via sitecustomize).
- Benchmark data is simulated ONCE in the parent (pure numpy) and cached to
  /tmp so relay-wedge retries don't repay the simulation cost.
- Each heavy attempt is preceded by a cheap 120 s "relay alive?" probe child;
  a wedged relay costs 120 s per retry, not a full bench timeout (120 s, not
  45: a cold-but-alive relay needs ~110 s for its first program).
- A global deadline bounds the whole run, there is no sleep after the final
  attempt, and the parent ALWAYS prints a parseable JSON line (an explicit
  error record on total failure) and exits 0 so the driver records a value
  instead of rc=124/parsed=null.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_TOTAL_BUDGET_S = 780.0  # leave headroom inside the driver's ~900 s window
# A cold-but-alive relay has been observed to take ~110 s for its FIRST tiny
# program (remote compiler spin-up); 45 s misclassified that as wedged.
_PROBE_TIMEOUT_S = 120.0
_DATA_CACHE = "/tmp/tike_bench_data_v2.npz"  # v2: tp.gaussian aperture probe
# Every successful on-chip measurement is journaled here; on total relay
# failure the error record carries the most recent one (clearly labeled as a
# PRIOR measurement, never substituted for the live value).
_LAST_GOOD = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "profile",
    "onchip",
    "last_good_bench.json",
)


def _emit(record):
    print(json.dumps(record), flush=True)


def _journal_good(record):
    """Journal a successful measurement, refusing implausible regressions.

    A degraded-relay run can produce a technically-successful number 100x
    below the real rate (observed: 197 patterns/s vs 46,692); journaling it
    would poison the 'most recent good' reference every later failure
    record cites. Overwrite only when the new value is at least half the
    journaled one (genuine regressions re-baseline within two rounds via
    the explicit bench history in BENCH_r{N}.json, which records every
    run regardless).
    """
    try:
        rec = dict(record)
        rec["measured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        )
        try:
            with open(_LAST_GOOD) as fh:
                prev = json.load(fh)
            if rec.get("value", 0) < 0.5 * prev.get("value", 0):
                return
        except Exception:
            pass
        os.makedirs(os.path.dirname(_LAST_GOOD), exist_ok=True)
        with open(_LAST_GOOD, "w") as fh:
            json.dump(rec, fh)
    except Exception:
        pass


def _simulate_numpy(det, probe, scan, psi):
    """Host-side (numpy) forward model for benchmark data generation.

    Kept off-device because the tunneled TPU backend cannot transfer large
    computed arrays back to the host (only small results and direct uploads).
    """
    p = probe.shape[-1]
    probe2d = probe[0, 0]  # (M, P, P)
    corner = np.floor(scan).astype(np.int64)
    frac = scan - corner
    n = len(scan)
    out = np.empty((n, det, det), np.float32)
    chunk = 512
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        pats = np.empty((hi - lo, p, p), np.complex64)
        for k, (c, f) in enumerate(zip(corner[lo:hi], frac[lo:hi])):
            win = psi[0, c[0] : c[0] + p + 1, c[1] : c[1] + p + 1]
            fy, fx = f
            pats[k] = (
                (1 - fy) * (1 - fx) * win[:-1, :-1]
                + (1 - fy) * fx * win[:-1, 1:]
                + fy * (1 - fx) * win[1:, :-1]
                + fy * fx * win[1:, 1:]
            )
        near = pats[:, None] * probe2d[None]  # (B, M, P, P)
        pad = (det - p) // 2
        if pad:
            near = np.pad(
                near, ((0, 0), (0, 0), (pad, det - p - pad), (pad, det - p - pad))
            )
        far = np.fft.fft2(near, norm="ortho")
        out[lo:hi] = np.sum(np.abs(far) ** 2, axis=1)
    return out


def _make_inputs(n_patterns, det=128, probe_shape=128, hw=1500):
    """Deterministic benchmark inputs (seed 0), matching BASELINE.json."""
    rng = np.random.default_rng(0)
    scan = np.stack(
        [
            rng.uniform(2, hw - probe_shape - 3, n_patterns),
            rng.uniform(2, hw - probe_shape - 3, n_patterns),
        ],
        -1,
    ).astype(np.float32)
    yy, xx = np.mgrid[0:hw, 0:hw] / hw
    psi = (
        np.exp(1j * 0.5 * np.sin(17 * yy) * np.cos(13 * xx))
        * (0.9 + 0.1 * np.cos(23 * xx * yy))
    ).astype(np.complex64)[None]
    # tike_tpu.ptycho.gaussian(size) — the soft-edged circular aperture the
    # r1-r3 benchmarks used — inlined verbatim so the parent stays jax-free
    # (importing tike_tpu pulls in jax, which hangs when the relay wedges).
    size, rin, rout = probe_shape, 0.8, 1.0
    r, c = np.mgrid[:size, :size] + 0.5
    rs = np.sqrt((r - size / 2) ** 2 + (c - size / 2) ** 2)
    rmax = np.sqrt(2) * 0.5 * rout * rs.max() + 1.0
    rmin = np.sqrt(2) * 0.5 * rin * rs.max()
    win = np.zeros((size, size), dtype=np.float32)
    win[rs < rmin] = 1.0
    zone = np.logical_and(rs > rmin, rs < rmax)
    win[zone] = np.divide(rmax - rs[zone], rmax - rmin)
    probe = (win * np.exp(1j * 0.2 * win))[None, None, None].astype(np.complex64)
    return scan, psi, probe


def _prepare_data(n_patterns):
    """Simulate (or load cached) benchmark data in the jax-free parent."""
    if os.path.exists(_DATA_CACHE):
        try:
            with np.load(_DATA_CACHE) as f:
                if f["data"].shape[0] == n_patterns:
                    return
        except Exception:
            pass
    scan, psi, probe = _make_inputs(n_patterns)
    data = _simulate_numpy(128, probe, scan, psi)
    tmp = _DATA_CACHE + ".tmp.npz"  # np.savez appends .npz to bare names
    np.savez(tmp, data=data)
    os.replace(tmp, _DATA_CACHE)


def _probe_relay():
    """Cheap child: does the backend come up and run one tiny program?"""
    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "x = np.asarray(jax.device_get(jnp.ones((8, 128)) @ jnp.ones((128, 8))));"
        "print('RELAY_OK', float(x.sum()), flush=True)"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=_PROBE_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return False, "probe timed out (relay wedged at init)"
    if proc.returncode == 0 and "RELAY_OK" in proc.stdout:
        return True, ""
    return False, f"probe rc={proc.returncode}: {proc.stderr[-400:]}"


def _run_child_supervised(argv, timeout_s, stall_s=330.0):
    """Run the bench child, killing it only on SILENCE, not on a hard cap.

    A healthy-but-slow relay (cold remote compiler, degraded tunnel) can
    legitimately take minutes between stage prints; killing such a child
    mid-program is itself a reliable way to WEDGE the relay (observed
    repeatedly — SIGKILL during an in-flight TPU call). So the child prints
    stage timestamps to stderr and the parent only kills it when stderr has
    been silent for ``stall_s`` (a true wedge) or the global deadline hits.

    Returns (rc, stdout_text, last_err_text). rc None => killed.
    """
    import tempfile

    out_f = tempfile.NamedTemporaryFile("w+", delete=False, suffix=".out")
    err_f = tempfile.NamedTemporaryFile("w+", delete=False, suffix=".err")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"] + argv,
        stdout=out_f,
        stderr=err_f,
        text=True,
    )
    deadline = time.monotonic() + timeout_s
    last_size = -1
    last_progress = time.monotonic()
    why = ""
    while True:
        rc = proc.poll()
        if rc is not None:
            break
        now = time.monotonic()
        try:
            size = os.path.getsize(err_f.name)
        except OSError:
            size = last_size
        if size != last_size:
            last_size = size
            last_progress = now
        if now > deadline:
            why = f"global deadline after {timeout_s:.0f}s"
        elif now - last_progress > stall_s:
            why = f"no progress output for {stall_s:.0f}s (relay wedge)"
        if why:
            proc.kill()
            proc.wait()
            rc = None
            break
        time.sleep(2.0)
    out_f.seek(0)
    stdout = open(out_f.name).read()
    stderr = open(err_f.name).read()
    os.unlink(out_f.name)
    os.unlink(err_f.name)
    # Forward the child's stage log so the orchestrator's captured log shows
    # where the time went.
    if stderr:
        print(stderr.rstrip(), file=sys.stderr, flush=True)
    return rc, stdout, why or f"child rc={rc}: {stderr[-600:]}"


def _run_with_budget(argv):
    deadline = time.monotonic() + _TOTAL_BUDGET_S
    n_patterns = int(argv[0]) if argv else 10_000
    if os.environ.get("TIKE_BENCH_UPLOAD") == "1":
        try:
            _prepare_data(n_patterns)
        except Exception as e:  # never let data prep kill the record
            print(
                f"bench: data prep failed, child will simulate: {e}",
                file=sys.stderr,
            )

    solver = argv[1] if len(argv) > 1 else "lsqml"
    last_err = "no attempt made"
    attempt = 0
    while time.monotonic() < deadline - _PROBE_TIMEOUT_S:
        attempt += 1
        ok, why = _probe_relay()
        if not ok:
            last_err = why
            print(f"bench probe {attempt}: {why}", file=sys.stderr, flush=True)
            # a wedged relay sometimes recovers within minutes; brief pause
            # unless that would push past the deadline
            if time.monotonic() + 20 < deadline - _PROBE_TIMEOUT_S:
                time.sleep(20)
            continue
        # Give the attempt everything that remains: one un-killed slow
        # attempt beats two killed fast ones (killing wedges the relay).
        child_timeout = max(60.0, deadline - time.monotonic() - 5.0)
        returncode, stdout, err = _run_child_supervised(argv, child_timeout)
        if returncode is None or returncode != 0:
            last_err = f"bench child failed: {err}"
            print(f"bench attempt {attempt}: {last_err}", file=sys.stderr, flush=True)
            continue
        proc_stdout = stdout
        line = next(
            (ln for ln in reversed(proc_stdout.splitlines()) if ln.startswith("{")),
            None,
        )
        if line is not None:
            try:
                rec = json.loads(line)
                if rec.get("value", 0) > 0 and "error" not in rec:
                    _journal_good(rec)
            except Exception:
                pass
            print(line, flush=True)
            return 0
        last_err = f"child exited 0 without a JSON record: {err}"
        print(f"bench attempt {attempt}: {last_err}", file=sys.stderr, flush=True)
    # Total failure: still emit a parseable record so the driver logs a value.
    record = {
        "metric": f"{solver}_epoch_patterns_per_sec_128px",
        "value": 0.0,
        "unit": "patterns/s",
        "vs_baseline": 0.0,
        "error": f"relay unavailable: {last_err}",
    }
    # Attach the most recent successful on-chip measurement (if any) so a
    # relay wedge at bench time does not erase the round's real number.
    # This is explicitly a PRIOR measurement: value stays 0.0 above.
    try:
        with open(_LAST_GOOD) as fh:
            record["last_good_onchip"] = json.load(fh)
    except Exception:
        pass
    _emit(record)
    return 0


def main():
    t0 = time.monotonic()
    # INFO logs to stderr: the chunked data upload logs one line per batch,
    # which the supervising parent counts as liveness (vs a true wedge).
    import logging

    logging.basicConfig(
        level=logging.INFO, stream=sys.stderr, format="%(asctime)s %(message)s"
    )

    def _stage(name):
        # Stage timestamps on stderr: when an attempt times out, the parent's
        # captured log shows which stage ate the budget (upload vs compile).
        print(f"bench child +{time.monotonic() - t0:6.1f}s {name}", file=sys.stderr, flush=True)

    import jax

    # Persistent compile cache: if the backend supports serialized
    # executables, a retry after a mid-compile wedge pays nothing the
    # second time. Harmless no-op where unsupported.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tike_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import tike_tpu.ptycho as tp
    from tike_tpu.utils import pairs, transfer

    _stage("imports done")
    n_patterns = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    solver = sys.argv[2] if len(sys.argv) > 2 else "lsqml"
    num_batch = int(os.environ.get("TIKE_BENCH_NUM_BATCH", "10"))

    # Tiny warmup op: the tunneled backend's first program on a cold remote
    # compiler is unreliable; a small program first stabilizes it.
    import jax.numpy as jnp

    np.asarray(jax.device_get(jnp.ones((8, 128)) @ jnp.ones((128, 8))))
    _stage("backend up (tiny program ran)")

    scan, psi, probe = _make_inputs(n_patterns)
    if os.environ.get("TIKE_BENCH_UPLOAD") == "1":
        # Legacy path: host-simulated data + full upload (the upload is
        # NOT in the timed region either way, but costs minutes of the
        # envelope on a slow tunnel).
        data = None
        if os.path.exists(_DATA_CACHE):
            # The parent promises "child will simulate" if its data prep
            # failed, so a corrupt cache file must not kill the attempt.
            try:
                with np.load(_DATA_CACHE) as f:
                    cached = f["data"]
                if cached.shape[0] == n_patterns:
                    data = cached
            except Exception as e:
                print(f"bench child: ignoring bad cache: {e}", file=sys.stderr)
        if data is None:
            data = _simulate_numpy(128, probe, scan, psi)
        _stage("benchmark data ready on host")
    else:
        # Simulate the diffraction data ON DEVICE (same model, same seed
        # inputs as _simulate_numpy) and hand the device-resident array to
        # Reconstruction: the dataset never crosses the tunnel in either
        # direction, so the whole child is compile + epochs. The timed
        # region (iterate) is identical to the upload path.
        data = tp.simulate_device(128, probe, scan, psi)
        transfer.scalar(data[0, 0, 0])  # force completion before staging
        _stage("benchmark data simulated on device")

    params = tp.PtychoParameters(
        probe=probe,
        psi=np.full_like(psi, 0.5),
        scan=scan,
        algorithm_options=(
            tp.LstsqOptions if solver == "lsqml" else tp.RpieOptions
        )(num_batch=num_batch, num_iter=1, batch_method="compact"),
        object_options=tp.ObjectOptions(),
        probe_options=tp.ProbeOptions(),
    )

    context = tp.Reconstruction(data, params)
    context.__enter__()
    _stage("context entered (data uploaded to device)")
    # Warm-up with the same epoch count so the timed call reuses the
    # compiled (possibly multi-epoch-fused) executable. block_until_ready
    # does NOT block on the relay; force a real host transfer instead.
    n_timed = 3

    def _sync():
        # In relay pair-mode psi is a Pair (a (..., 2) float pytree node),
        # which jnp.asarray rejects — sync on its float leaf instead.
        psi = context.parameters.psi
        leaf = psi.data if isinstance(psi, pairs.Pair) else psi
        transfer.scalar(jnp.abs(jnp.asarray(leaf)).sum())

    context.iterate(n_timed)
    _sync()
    _stage("warm-up epochs done (compile paid)")
    start = time.perf_counter()
    context.iterate(n_timed)
    _sync()
    elapsed = time.perf_counter() - start

    patterns_per_sec = n_patterns * n_timed / elapsed
    record = {
        "metric": f"{solver}_epoch_patterns_per_sec_128px",
        "value": round(patterns_per_sec, 1),
        "unit": "patterns/s",
        "vs_baseline": round(patterns_per_sec / 10_000, 3),
    }
    try:  # quality transparency: the timed epochs' final mean cost
        costs = context.parameters.algorithm_options.costs
        record["final_cost"] = round(float(np.mean(costs[-1])), 6)
        record["num_batch"] = num_batch
    except Exception:
        pass
    # Journal in the child too: if the orchestrating parent died (observed
    # when a relay-alive window opens mid-restart), the measurement must
    # not be lost with the broken stdout pipe.
    _journal_good(record)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        sys.argv.remove("--child")
        main()
    else:
        sys.exit(_run_with_budget(sys.argv[1:]))

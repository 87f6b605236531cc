"""Measured HBM ceiling + dispatch-floor decomposition for this relay.

VERDICT r4 item 2: the fused gradient program sustains 227 GB/s = 27.7% of
the v5e *paper* peak (819 GB/s), but no one ever measured what THIS chip
behind THIS relay can actually stream. Two measurements close that:

1. Pure-HBM stream (axpy): carry = carry + 0.5 * x over arrays sized at /
   around the gradient program's working set. Reads 2S + writes S per
   step; no MXU, no gather — the achievable-bandwidth ceiling.
2. k-batches-per-program sweep of the FULL rpie batch gradient (k = 1..32
   scan repetitions inside one program): ms/batch vs k separates the
   per-program dispatch floor (relay round-trip + program launch) from the
   sustained on-chip rate. ms/batch(k) ~= floor/k + sustained.

Run on the chip:  python profile/hbm_ceiling_tpu.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tike_tpu.utils.pairs import pair_jit, Pair  # noqa: E402
from tike_tpu.utils.transfer import to_host  # noqa: E402
from tike_tpu.ops.ptycho import PtychoConfig  # noqa: E402
from tike_tpu.ptycho.solvers.rpie import _batch_gradients_math  # noqa: E402

HBM_GBPS = 819.0  # v5e paper peak


def time_scalar_prog(prog, args, reps):
    """Wall time of prog(*args) -> tiny array, averaged over 2 runs."""
    def once():
        return to_host(prog(*args).reshape(-1)[:1])

    once()
    t0 = time.perf_counter()
    for _ in range(reps):
        once()
    return (time.perf_counter() - t0) / reps


def stream_bench():
    print("== pure HBM stream (axpy: c = c + 0.5*x, 3S bytes/step) ==",
          flush=True)
    rng = np.random.default_rng(0)
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    for mb in (64, 128, 256, 512):
        S = mb * 1024 * 1024 // 4  # f32 elements
        rows = 8 * 1024
        x = jnp.asarray(rng.standard_normal((rows, S // rows))
                        .astype(np.float32))
        K = 16

        @jax.jit
        def prog(x0):
            def body(c, _):
                return c + 0.5 * x0, None

            c, _ = jax.lax.scan(
                body, jnp.zeros_like(x0), None, length=K
            )
            return jnp.sum(c[:1, :8]).reshape(1)

        dt = time_scalar_prog(prog, (x,), 2) / K
        gbs = 3 * S * 4 / dt * 1e-9
        print(
            f"  {mb:4d} MB working set: {dt * 1e3:7.2f} ms/step "
            f"-> {gbs:6.0f} GB/s ({100 * gbs / HBM_GBPS:5.1f}% of paper "
            f"peak)",
            flush=True,
        )


def ksweep():
    print("== k-batches-per-program sweep (FULL rpie batch gradient) ==",
          flush=True)
    B, P, HW, M = 1000, 128, 1500, 1
    cfg = PtychoConfig(probe_shape=P, detector_shape=P, nz=HW, n=HW)
    rng = np.random.default_rng(0)
    psi = Pair(jnp.asarray(np.stack(
        [np.ones((1, HW, HW)), np.zeros((1, HW, HW))], -1
    ).astype(np.float32)))
    probe = Pair(jnp.asarray(np.stack(
        [rng.standard_normal((1, 1, M, P, P)),
         rng.standard_normal((1, 1, M, P, P))], -1
    ).astype(np.float32)))
    pos = jnp.asarray(np.stack(
        [rng.uniform(2, HW - P - 3, B), rng.uniform(2, HW - P - 3, B)], -1
    ).astype(np.float32))
    data = jnp.asarray(rng.random((B, P, P)).astype(np.float32))
    idx = jnp.arange(B, dtype=jnp.int32)
    mask = jnp.ones(B, jnp.float32)
    mpix = jnp.ones((P, P), bool)

    results = []
    for k in (1, 2, 4, 8, 16, 32):
        @pair_jit
        def prog(d, s, i, m, ps, pr, mp, _k=k):
            def body(carry, _):
                costs, psi_num, _, _ = _batch_gradients_math(
                    cfg, d, s, i, m, ps * (1 + 0 * carry), pr, None, None,
                    mp, 0.5, 0.5, 1.0, noise_model="gaussian",
                    steplength_usemodes="all_modes", recover_probe=True)
                return (jnp.sum(costs)
                        + jnp.sum(jnp.abs(psi_num))) * 1e-12 + carry, None

            out, _ = jax.lax.scan(
                body, jnp.float32(1.0), None, length=_k
            )
            return out.reshape(1)

        dt = time_scalar_prog(
            prog, (data, pos, idx, mask, psi, probe, mpix), 2
        )
        results.append((k, dt))
        print(
            f"  k={k:3d}: {dt * 1e3:8.2f} ms/program "
            f"= {dt / k * 1e3:7.2f} ms/batch "
            f"({B * k / dt:8.0f} patterns/s)",
            flush=True,
        )
    # Linear fit dt(k) = floor + k * sustained
    ks = np.array([r[0] for r in results], dtype=np.float64)
    ts = np.array([r[1] for r in results], dtype=np.float64)
    A = np.stack([np.ones_like(ks), ks], -1)
    coef, *_ = np.linalg.lstsq(A, ts, rcond=None)
    floor_ms, sustained_ms = coef[0] * 1e3, coef[1] * 1e3
    print(
        f"  fit: per-program dispatch floor {floor_ms:.2f} ms; sustained "
        f"{sustained_ms:.2f} ms/batch ({B / (coef[1]):.0f} patterns/s "
        f"asymptotic)",
        flush=True,
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "stream"):
        stream_bench()
    if which in ("all", "ksweep"):
        ksweep()


if __name__ == "__main__":
    main()

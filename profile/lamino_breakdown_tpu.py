"""Per-stage breakdown of the config-3 laminography CG iteration.

VERDICT r4 item 4 prerequisite: config 3 (lamino cgrad, 128^3 volume,
ntheta=64, KB kernel) sits at 2.69 s/outer-iter with no stated bound. This
harness times each stage of lamino_grad in isolation at the exact config-3
shape — make_grids, the 3D FFTs, the KB gather (fwd interpolation), the KB
scatter (adjoint spreading), deapodization — so the tiled-scatter rewrite
targets the measured hot stage instead of the assumed one.

Relay-safe: K in-program repetitions per timing inside one lax.scan, float
pair boundaries, one scalar downloaded per timing. Run on the chip:

    python profile/lamino_breakdown_tpu.py [ntheta] [K]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tike_tpu.utils.pairs import pair_jit, Pair  # noqa: E402
from tike_tpu.utils.transfer import to_host  # noqa: E402
from tike_tpu.ops.lamino import (  # noqa: E402
    LaminoConfig, make_grids, lamino_fwd, lamino_adj, lamino_grad,
)
from tike_tpu.ops import usfft  # noqa: E402

HBM_GBPS = 819.0  # v5e peak HBM bandwidth (paper)


def main():
    ntheta = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 128
    cfg = LaminoConfig(n=n, tilt=float(np.pi / 3))
    up, pad, m, beta = usfft.kb_parameters(n, cfg.eps, cfg.upsample)
    N = ntheta * n * n
    print(
        f"config3 shape: n={n} ntheta={ntheta} upsampled={up} m={m} "
        f"taps={(2 * m) ** 3} N={N}",
        flush=True,
    )
    rng = np.random.default_rng(0)
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))

    rows = []

    def repeat(opname, gbytes, fn, *args):
        @pair_jit
        def prog(*a):
            def body(carry, _):
                return fn(*a, carry), None

            out, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=K)
            return out

        def once():
            return to_host(prog(*args).reshape(1))

        once()
        t0 = time.perf_counter()
        once()
        once()
        dt = (time.perf_counter() - t0) / 2 / K
        rows.append((opname, dt * 1e3, gbytes))
        gbs = gbytes / dt if dt > 0 else float("inf")
        print(
            f"{opname:>30s}: {dt * 1e3:8.2f} ms"
            f"  model {gbytes * 1e3:7.1f} MB"
            f"  -> {gbs:6.0f} GB/s ({100 * gbs / HBM_GBPS:5.1f}% peak)",
            flush=True,
        )
        return dt

    # ---- inputs (float-pair boundaries) ----
    u = Pair(jnp.asarray(np.stack(
        [rng.standard_normal((n, n, n)), rng.standard_normal((n, n, n))], -1
    ).astype(np.float32)))
    data = Pair(jnp.asarray(np.stack(
        [rng.standard_normal((ntheta, n, n)),
         rng.standard_normal((ntheta, n, n))], -1
    ).astype(np.float32)))
    theta = jnp.asarray(
        np.linspace(0, 2 * np.pi, ntheta, endpoint=False).astype(np.float32)
    )
    Fvals = Pair(jnp.asarray(np.stack(
        [rng.standard_normal(N), rng.standard_normal(N)], -1
    ).astype(np.float32)))

    gb = 1e-9
    b_vol = up**3 * 8 * gb          # complex64 volume, one pass
    b_pts = N * 8 * gb              # complex64 point values, one pass
    T = (2 * m) ** 3

    repeat(
        "make_grids",
        N * 3 * 4 * gb,
        lambda th, c: jnp.sum(make_grids(th * (1 + 0 * c), n, cfg.tilt))
        * 1e-12 + c,
        theta,
    )

    def fft3(v, c):
        F = jnp.fft.fftshift(jnp.fft.fftn(jnp.fft.ifftshift(v * (1 + 0 * c))))
        return jnp.sum(jnp.abs(F)) * 1e-12 + c

    # 3 axes x (read+write) passes is the usual multi-pass FFT model
    repeat("fft3 (128^3)", 6 * b_vol, fft3, u)

    xi = make_grids(theta, n, cfg.tilt)

    def gather_only(v, th, c):
        g = usfft.gather_kb(v * (1 + 0 * c), xi, up, m, beta)
        return jnp.sum(jnp.abs(g)) * 1e-12 + c

    # per tap: read N weights-worth of grid + r/w the (N,2) accumulator
    repeat(
        f"gather_kb ({T} taps)",
        (T * b_pts + T * 2 * b_pts),
        gather_only, u, theta,
    )

    def scatter_only(f, th, c):
        G = usfft.scatter_kb(f.reshape(-1) * (1 + 0 * c), xi, up, m, beta)
        return jnp.sum(jnp.abs(G)) * 1e-12 + c

    # per tap: read N values + r/w the full grid accumulator
    repeat(
        f"scatter_kb ({T} taps)",
        T * (b_pts + 2 * b_vol),
        scatter_only, Fvals, theta,
    )

    def fwd_full(v, th, c):
        d = lamino_fwd(cfg, v * (1 + 0 * c), th)
        return jnp.sum(jnp.abs(d)) * 1e-12 + c

    repeat("lamino_fwd FULL", 6 * b_vol + T * 3 * b_pts, fwd_full, u, theta)

    def adj_full(d, th, c):
        v = lamino_adj(cfg, d * (1 + 0 * c), th)
        return jnp.sum(jnp.abs(v)) * 1e-12 + c

    repeat(
        "lamino_adj FULL",
        6 * b_vol + T * (b_pts + 2 * b_vol),
        adj_full, data, theta,
    )

    def grad_full(d, v, th, c):
        g = lamino_grad(cfg, d, th, v * (1 + 0 * c))
        return jnp.sum(jnp.abs(g)) * 1e-12 + c

    dt = repeat(
        "lamino_grad FULL (fwd+adj)",
        12 * b_vol + T * (4 * b_pts + 2 * b_vol),
        grad_full, data, u, theta,
    )

    # Round-5 additions: the exact adjoint (CGLS's operator) and one CGLS
    # outer iteration, to attribute the measured 0.63 s/outer-iter.
    from tike_tpu.ops.lamino import lamino_adj_exact
    import tike_tpu.opt as _opt

    def adj_exact_full(d, th, c):
        v = lamino_adj_exact(cfg, d * (1 + 0 * c), th)
        return jnp.sum(jnp.abs(v)) * 1e-12 + c

    repeat(
        "lamino_adj_exact FULL",
        6 * b_vol + T * (b_pts + 2 * b_vol),
        adj_exact_full, data, theta,
    )

    def cgls_outer(d, v, th, c):
        x, cost = _opt.cgls_traced(
            fwd=lambda uu: lamino_fwd(cfg, uu, th),
            adj=lambda rr: lamino_adj_exact(cfg, rr, th),
            b=d,
            x0=v * (1 + 0 * c),
            num_iter=4,
        )
        return cost * 1e-12 + c

    repeat(
        "CGLS outer (4 inner: 5 fwd+5 adj)",
        10 * (6 * b_vol + T * 2 * b_pts),
        cgls_outer, data, u, theta,
    )
    print(
        f"summary: grad {dt * 1e3:.1f} ms/call; a cgrad outer iter runs "
        f"grad + fwd (line search) + cost ~= {dt * 1e3 * 1.7:.0f} ms if "
        f"stage-bound", flush=True,
    )


if __name__ == "__main__":
    main()

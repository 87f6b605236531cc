"""Per-stage byte/time breakdown of the ptycho gradient program.

VERDICT r3 item 2: the gradient program ran ~3x above its HBM-byte bound
with no attribution. This harness times each stage of the rPIE batch
gradient (`solvers/rpie._batch_gradients_math`) in isolation, models the
HBM bytes each stage must move, and prints achieved GB/s per stage plus
the stage-sum vs whole-program comparison — so the residual gap is
attributed to a stage (or to dispatch) instead of guessed.

Relay-safe: K in-program repetitions per timing inside one lax.scan, float
pair boundaries, one scalar downloaded per timing. Run on the chip:

    python profile/roofline_tpu.py [B] [K]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tike_tpu.utils.pairs import pair_jit, Pair  # noqa: E402
from tike_tpu.utils.transfer import to_host  # noqa: E402
from tike_tpu.ops.patch import (  # noqa: E402
    patch_fwd, patch_adj, _tile_dims,
)
from tike_tpu.ops.ptycho import (  # noqa: E402
    PtychoConfig, _crop_from_detector, _pad_to_detector,
    intensity_from_farplane,
)
from tike_tpu.ops.propagation import (  # noqa: E402
    propagation_fwd_fast, propagation_adj_fast,
)
from tike_tpu.ops.objective import GRAD  # noqa: E402
from tike_tpu.ptycho.solvers.rpie import _batch_gradients_math  # noqa: E402

HBM_GBPS = 819.0  # v5e peak HBM bandwidth


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    P, HW, M = 128, 1500, 1
    cfg = PtychoConfig(probe_shape=P, detector_shape=P, nz=HW, n=HW)
    rng = np.random.default_rng(0)
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))

    rows = []

    def repeat(opname, gbytes, fn, *args):
        """Time fn K times in one program; record (name, ms, model GB)."""

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
            f"{opname:>34s}: {dt * 1e3:7.2f} ms"
            f"  model {gbytes * 1e3:7.1f} MB"
            f"  -> {gbs:6.0f} GB/s ({100 * gbs / HBM_GBPS:5.1f}% peak)",
            flush=True,
        )
        return dt

    # ---- inputs (float-pair boundaries; complex assembled in-program) ----
    img = Pair(jnp.asarray(np.stack(
        [rng.standard_normal((HW, HW)), rng.standard_normal((HW, HW))], -1
    ).astype(np.float32)))
    pos = jnp.asarray(np.stack(
        [rng.uniform(2, HW - P - 3, B), rng.uniform(2, HW - P - 3, B)], -1
    ).astype(np.float32))
    x = Pair(jnp.asarray(np.stack(  # (B, P, P) complex stand-in
        [rng.standard_normal((B, P, P)), rng.standard_normal((B, P, P))], -1
    ).astype(np.float32)))
    xm = Pair(jnp.asarray(np.stack(  # (B, M, P, P)
        [rng.standard_normal((B, M, P, P)),
         rng.standard_normal((B, M, P, P))], -1
    ).astype(np.float32)))
    probe = Pair(jnp.asarray(np.stack(
        [rng.standard_normal((1, 1, M, P, P)),
         rng.standard_normal((1, 1, M, P, P))], -1
    ).astype(np.float32)))
    psi = Pair(jnp.asarray(np.stack(
        [np.ones((1, HW, HW)), np.zeros((1, HW, HW))], -1
    ).astype(np.float32)))
    data = jnp.asarray(rng.random((B, P, P)).astype(np.float32))
    idx = jnp.arange(B, dtype=jnp.int32)
    mask = jnp.ones(B, jnp.float32)
    mpix = jnp.ones((P, P), bool)

    # ---- byte models (GB), complex64 = 8 B, f32 = 4 B ----
    th, tw = _tile_dims(P)
    gb = 1e-9
    b_tile_read = B * 2 * th * tw * 4 * gb  # aligned-tile gather reads
    b_patches = B * P * P * 8 * gb
    b_far = B * M * P * P * 8 * gb
    b_data = B * P * P * 4 * gb

    repeat(
        "patch_fwd (gather+blend)",
        b_tile_read + b_patches,
        lambda i, s, c: jnp.sum(
            jnp.abs(patch_fwd(i * (1 + 0 * c), s, P,
                              precision=jax.lax.Precision.HIGH)) ** 2
        ) * 1e-12 + c,
        img, pos,
    )

    def probe_mult_fft(q, pr, c):
        near = (q * (1 + 0 * c))[:, None] * pr[0, 0]
        far = propagation_fwd_fast(_pad_to_detector(near, cfg))
        return jnp.sum(jnp.abs(far)) * 1e-12 + c

    # read patches + probe, write farplane; FFT assumed >= 1 extra r/w pass
    repeat(
        "probe-mult + fft2",
        b_patches + 3 * b_far,
        probe_mult_fft, x, probe,
    )

    def exitwave_chain(f, d, c):
        far = f * (1 + 0 * c)
        intensity = intensity_from_farplane(far)
        upd = -GRAD["gaussian"](d, far, intensity)
        return jnp.sum(jnp.abs(upd)) * 1e-12 + c

    # read farplane + data, write update (intensity fused)
    repeat(
        "intensity + gaussian grad",
        2 * b_far + b_data,
        exitwave_chain, xm, data,
    )

    def ifft_crop(f, c):
        diff = _crop_from_detector(propagation_adj_fast(f * (1 + 0 * c)), cfg)
        return jnp.sum(jnp.abs(diff)) * 1e-12 + c

    repeat("ifft2 + crop", 3 * b_far, ifft_crop, xm)

    def gradpsi_adj(d, pr, s, c):
        grad_psi = jnp.sum(jnp.conj(pr[0, 0]) * d, axis=1) / M * (1 + 0 * c)
        acc = patch_adj(grad_psi, s, (HW, HW),
                        precision=jax.lax.Precision.HIGH)
        return jnp.sum(jnp.abs(acc)) * 1e-12 + c

    # read diff, render tiles (write+read for merge), grid r/w ~ 2 img
    b_img = 2 * HW * HW * 4 * gb
    repeat(
        "conj(probe)*diff + patch_adj",
        b_far + 2 * b_tile_read + 2 * b_img,
        gradpsi_adj, xm, probe, pos,
    )

    def probe_num(q, d, c):
        pn = jnp.sum(jnp.conj(q * (1 + 0 * c))[:, None] * d, axis=0)
        return jnp.sum(jnp.abs(pn)) * 1e-12 + c

    # read patches + diff (write is tiny)
    repeat("probe numerator reduce", b_patches + b_far, probe_num, x, xm)

    total_model = sum(r[2] for r in rows)
    total_ms = sum(r[1] for r in rows)

    def full(d, s, i, m, ps, pr, mp, c):
        costs, psi_num, probe_num_, _ = _batch_gradients_math(
            cfg, d, s, i, m, ps * (1 + 0 * c), pr, None, None, mp,
            0.5, 0.5, 1.0, noise_model="gaussian",
            steplength_usemodes="all_modes", recover_probe=True)
        return (jnp.sum(costs) + jnp.sum(jnp.abs(psi_num))) * 1e-12 + c

    dt_full = repeat(
        "FULL rpie batch gradient",
        total_model,
        full, data, pos, idx, mask, psi, probe, mpix,
    )
    print(
        f"{'stage sum':>34s}: {total_ms:7.2f} ms"
        f"  model {total_model * 1e3:7.1f} MB"
        f"  (full/sum = {dt_full * 1e3 / total_ms:4.2f}x;"
        f" full vs pure-BW bound = "
        f"{dt_full / (total_model / HBM_GBPS):4.2f}x)",
        flush=True,
    )


if __name__ == "__main__":
    main()

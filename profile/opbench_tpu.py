"""Relay-noise-immune per-op timing: repeat each op K times inside one
jitted lax.scan so host dispatch latency amortizes away.

Usage: python profile/opbench_tpu.py [B] [K]
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, ".")
from tike_tpu.utils.pairs import pair_jit, Pair
from tike_tpu.utils.transfer import to_host
from tike_tpu.ops.patch import patch_fwd, patch_adj
from tike_tpu.ops.ptycho import PtychoConfig
from tike_tpu.ptycho.solvers.rpie import _batch_gradients_math
from tike_tpu.ptycho.solvers.lstsq import _lstsq_batch_math
from tike_tpu.ptycho.solvers._preconditioner import (
    _psi_precond_math, _probe_precond_math,
)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    P, HW, M = 128, 1500, 1
    cfg = PtychoConfig(probe_shape=P, detector_shape=P, nz=HW, n=HW)
    rng = np.random.default_rng(0)
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))

    def repeat(opname, fn, *args):
        """Time fn applied K times in one program (perturbed each rep)."""

        @pair_jit
        def prog(*a):
            def body(carry, _):
                out = fn(*a, carry)
                return out, None
            out, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=K)
            return out

        def once():
            return to_host(prog(*args).reshape(1))

        once()
        t0 = time.perf_counter()
        once(); once()
        dt = (time.perf_counter() - t0) / 2
        print(f"{opname:>28s}: {dt / K * 1e3:7.2f} ms/op", flush=True)

    img = Pair(jnp.asarray(np.stack(
        [rng.standard_normal((HW, HW)), rng.standard_normal((HW, HW))], -1
    ).astype(np.float32)))
    pos = jnp.asarray(np.stack(
        [rng.uniform(2, HW - P - 3, B), rng.uniform(2, HW - P - 3, B)], -1
    ).astype(np.float32))
    x = Pair(jnp.asarray(np.stack(
        [rng.standard_normal((B, P, P)), rng.standard_normal((B, P, P))], -1
    ).astype(np.float32)))
    psi = Pair(jnp.asarray(np.stack(
        [np.ones((1, HW, HW)), np.zeros((1, HW, HW))], -1
    ).astype(np.float32)))
    probe = Pair(jnp.asarray(np.stack(
        [rng.standard_normal((1, 1, M, P, P)),
         rng.standard_normal((1, 1, M, P, P))], -1
    ).astype(np.float32)))
    data = jnp.asarray(rng.random((B, P, P)).astype(np.float32))
    idx = jnp.arange(B, dtype=jnp.int32)
    mask = jnp.ones(B, jnp.float32)
    mpix = jnp.ones((P, P), bool)

    repeat("noop", lambda c: c + 1e-7)
    repeat("patch_fwd", lambda i, s, c: jnp.sum(
        jnp.abs(patch_fwd(i * (1 + 0 * c), s, P))**2) * 1e-12 + c, img, pos)
    repeat("patch_adj", lambda q, s, c: jnp.sum(
        jnp.abs(patch_adj(q * (1 + 0 * c), s, (HW, HW)))**2) * 1e-12 + c,
        x, pos)
    repeat("fft2+ifft2", lambda v, c: jnp.sum(jnp.abs(jnp.fft.ifft2(
        jnp.fft.fft2(v * (1 + 0 * c), norm="ortho"),
        norm="ortho"))**2) * 1e-12 + c, x)
    repeat("psi_precond", lambda ps, s, pr, m, c: jnp.sum(jnp.abs(
        _psi_precond_math(cfg, ps * (1 + 0 * c), s, pr, m))) * 1e-12 + c,
        psi, pos, probe, mask)
    repeat("probe_precond", lambda ps, s, m, c: jnp.sum(jnp.abs(
        _probe_precond_math(cfg, ps * (1 + 0 * c), s, m))) * 1e-12 + c,
        psi, pos, mask)

    def bg(d, s, i, m, ps, pr, mp, c):
        costs, psi_num, probe_num, _ = _batch_gradients_math(
            cfg, d, s, i, m, ps * (1 + 0 * c), pr, None, None, mp,
            0.5, 0.5, 1.0, noise_model="gaussian",
            steplength_usemodes="all_modes", recover_probe=True)
        return (jnp.sum(costs) + jnp.sum(jnp.abs(psi_num))) * 1e-12 + c

    repeat("rpie batch_gradients", bg, data, pos, idx, mask, psi, probe,
           mpix)

    pre = Pair(jnp.asarray(np.stack(
        [np.ones((1, HW, HW)), np.zeros((1, HW, HW))], -1
    ).astype(np.float32)))

    def lq(d, s, i, m, ps, pr, mp, pc, c):
        out = _lstsq_batch_math(
            cfg, d, s, i, m, ps * (1 + 0 * c), pr, None, None, mp, pc,
            0.5, 0.5, 1.0, num_batch=10.0, noise_model="gaussian",
            steplength_usemodes="all_modes", recover_psi=True,
            recover_probe=True, recover_positions=False)
        return (jnp.sum(out["costs"])
                + jnp.sum(jnp.abs(out["object_upd_sum"]))) * 1e-12 + c

    repeat("lstsq batch", lq, data, pos, idx, mask, psi, probe, mpix, pre)


if __name__ == "__main__":
    main()

"""On-chip A/B of the patch-op formulations (round 4).

The roofline attributed patch_fwd's cost to HIGHEST-precision MXU
decomposition passes of the blend-folded selection einsum, not to HBM
bytes. The split-blend formulation (TIKE_PATCH_SPLIT_BLEND=1) keeps the
selection matmuls pure 0/1 — exactly representable in bf16 — so the
selection operand can run at DEFAULT per-operand precision with the data
operand at the caller's precision, and applies the bilinear blend as a
separate elementwise stage. This measures both paths at the production
shape plus the numeric deltas, to decide promotion.

Run on the chip:  python profile/patch_variants_tpu.py [B] [K]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import tike_tpu.ops.patch as patch_module  # noqa: E402
from tike_tpu.utils.pairs import pair_jit, Pair  # noqa: E402
from tike_tpu.utils.transfer import to_host  # noqa: E402

HIGHEST = jax.lax.Precision.HIGHEST
HIGH = jax.lax.Precision.HIGH


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    P, HW = 128, 1500
    rng = np.random.default_rng(0)
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))

    img = Pair(jnp.asarray(np.stack(
        [rng.standard_normal((HW, HW)), rng.standard_normal((HW, HW))], -1
    ).astype(np.float32)))
    pos = jnp.asarray(np.stack(
        [rng.uniform(2, HW - P - 3, B), rng.uniform(2, HW - P - 3, B)], -1
    ).astype(np.float32))
    pat = Pair(jnp.asarray(np.stack(
        [rng.standard_normal((B, P, P)), rng.standard_normal((B, P, P))], -1
    ).astype(np.float32)))

    def time_prog(name, make_fn):
        @pair_jit
        def prog(img, pos, pat):
            def body(carry, _):
                return make_fn(img, pos, pat, carry), None

            out, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=K)
            return out

        def once():
            return to_host(prog(img, pos, pat).reshape(1))

        once()
        t0 = time.perf_counter()
        once()
        once()
        dt = (time.perf_counter() - t0) / 2 / K
        print(f"{name:>44s}: {dt * 1e3:7.2f} ms", flush=True)
        return dt

    def fwd_fn(precision):
        def f(img, pos, pat, carry):
            out = patch_module.patch_fwd(img * carry, pos, P, precision)
            return jnp.abs(out[0, 0, 0]) + carry * 0.0

        return f

    def adj_fn(precision):
        def f(img, pos, pat, carry):
            out = patch_module.patch_adj(
                pat * carry, pos, (HW, HW), precision=precision
            )
            return jnp.abs(out[0, 0]) + carry * 0.0

        return f

    results = {}
    for split in (False, True):
        patch_module._SPLIT_BLEND = split
        tag = "split-blend" if split else "fused-blend"
        for prec_name, prec in (("HIGHEST", HIGHEST), ("HIGH", HIGH)):
            results[(split, "fwd", prec_name)] = time_prog(
                f"patch_fwd {tag} data={prec_name}", fwd_fn(prec)
            )
            results[(split, "adj", prec_name)] = time_prog(
                f"patch_adj {tag} data={prec_name}", adj_fn(prec)
            )

    # Numeric deltas vs fused HIGHEST (the parity surface), small shape so
    # the relay download path stays reliable.
    Bs = 64
    pos_s = pos[:Bs]
    pat_s = Pair(pat.data[:Bs])

    @pair_jit
    def delta(img, pos, pat):
        patch_module._SPLIT_BLEND = False
        f_ref = patch_module.patch_fwd(img, pos, P, HIGHEST)
        a_ref = patch_module.patch_adj(pat, pos, (HW, HW), precision=HIGHEST)
        patch_module._SPLIT_BLEND = True
        f_sb = patch_module.patch_fwd(img, pos, P, HIGHEST)
        a_sb = patch_module.patch_adj(pat, pos, (HW, HW), precision=HIGHEST)
        df = jnp.max(jnp.abs(f_sb - f_ref)) / jnp.max(jnp.abs(f_ref))
        da = jnp.max(jnp.abs(a_sb - a_ref)) / jnp.max(jnp.abs(a_ref))
        return jnp.stack([df, da])

    d = to_host(delta(img, pos_s, pat_s))
    print(f"split-blend vs fused-HIGHEST max rel: fwd {d[0]:.2e} adj {d[1]:.2e}")

    for op in ("fwd", "adj"):
        base = results[(False, op, "HIGHEST")]
        best = min(
            (v, k) for k, v in results.items() if k[1] == op and k[0]
        )
        print(
            f"patch_{op}: fused HIGHEST {base * 1e3:.2f} ms -> best split "
            f"{best[0] * 1e3:.2f} ms ({base / best[0]:.2f}x) [{best[1][2]}]"
        )


if __name__ == "__main__":
    main()

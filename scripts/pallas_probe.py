#!/usr/bin/env python
"""Probe which Mosaic (Pallas TPU) features the attached backend compiles.

The tunneled axon relay forwards compilations to a remote tpu_compile_helper
whose Mosaic support has changed between rounds; this probe records the
current feature matrix so PALLAS_VERDICT.md stays honest. Run on the chip:

    python scripts/pallas_probe.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tike_tpu.utils.transfer as transfer

    def sync(y):
        return transfer.to_host(jnp.reshape(jnp.sum(y), (1,)))[0]

    results = {}

    def probe(name, fn):
        try:
            fn()
            results[name] = "OK"
        except Exception as e:
            results[name] = f"FAIL ({str(e)[:80]})"

    x = jnp.ones((8, 128, 128), jnp.float32)

    def trivial():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2.0

        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32)
        )(x[0])
        sync(y)

    probe("elementwise kernel", trivial)

    def gridded():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2.0

        y = pl.pallas_call(
            k,
            grid=(8,),
            in_specs=[pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128, 128), jnp.float32),
        )(x)
        sync(y)

    probe("grid + VMEM blocks", gridded)

    def prefetch():
        def k(idx_ref, x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1.0

        idx = jnp.asarray(np.arange(8)[::-1].copy().astype(np.int32))
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(8,),
            in_specs=[
                pl.BlockSpec(
                    (1, 128, 128), lambda i, idx_ref: (idx_ref[i], 0, 0)
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 128, 128), lambda i, idx_ref: (i, 0, 0)
            ),
        )
        y = pl.pallas_call(
            k,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8, 128, 128), jnp.float32),
        )(idx, x)
        sync(y)

    probe("scalar-prefetch index map", prefetch)

    def static_dma():
        def k(x_ref, o_ref, win, sem):
            c = pltpu.make_async_copy(
                x_ref.at[pl.ds(0, 128), pl.ds(0, 128)], win, sem
            )
            c.start()
            c.wait()
            o_ref[...] = win[...]

        y = pl.pallas_call(
            k,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((128, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((128, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(x[0])
        sync(y)

    probe("static-offset DMA (ANY->VMEM)", static_dma)

    def dynamic_dma():
        big = jnp.ones((1024, 1024), jnp.float32)
        corner = jnp.asarray(
            np.stack([np.arange(8) * 8, np.arange(8) * 16], -1).astype(
                np.int32
            )
        )

        def k(c_ref, x_ref, o_ref, win, sem):
            i = pl.program_id(0)
            iy = c_ref[i, 0]
            ix = c_ref[i, 1]
            c = pltpu.make_async_copy(
                x_ref.at[pl.ds(iy, 128), pl.ds(ix, 256)], win, sem
            )
            c.start()
            c.wait()
            o_ref[0] = win[...]

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(8,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 128, 256), lambda i, c: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((128, 256), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        y = pl.pallas_call(
            k,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8, 128, 256), jnp.float32),
        )(corner, big)
        sync(y)

    probe("dynamic-offset DMA (the patch-kernel ingredient)", dynamic_dma)

    def element_static():
        big = jnp.ones((1024, 1024), jnp.float32)

        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2.0

        y = pl.pallas_call(
            k,
            grid=(8,),
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(128), pl.Element(256)),
                    lambda i: (i * 8, i * 16),
                )
            ],
            out_specs=pl.BlockSpec((1, 128, 256), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128, 256), jnp.float32),
        )(big)
        sync(y)

    probe("Element-indexed block (grid-affine unaligned starts)",
          element_static)

    def element_prefetch():
        big = jnp.ones((1024, 1024), jnp.float32)
        corner = jnp.asarray(
            np.stack([np.arange(8) * 9 + 3, np.arange(8) * 17 + 5], -1)
            .astype(np.int32)
        )

        def k(c_ref, x_ref, o_ref):
            o_ref[0] = x_ref[...] * 2.0

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(8,),
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(128), pl.Element(256)),
                    lambda i, c: (c[i, 0], c[i, 1]),
                )
            ],
            out_specs=pl.BlockSpec((1, 128, 256), lambda i, c: (i, 0, 0)),
        )
        y = pl.pallas_call(
            k,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8, 128, 256), jnp.float32),
        )(corner, big)
        sync(y)

    probe(
        "Element-indexed block w/ scalar-prefetch starts "
        "(patch_fwd_pallas_elem ingredient)",
        element_prefetch,
    )

    def patch_fwd_elem_production():
        from tike_tpu.ops.patch_pallas import patch_fwd_pallas_elem

        # Build the complex image on-device (direct complex uploads wedge
        # the relay — see the verify skill / ROUND3.md).
        img = jax.lax.complex(
            jnp.ones((512, 512), jnp.float32),
            jnp.zeros((512, 512), jnp.float32),
        )
        posn = jnp.asarray(
            np.random.default_rng(0)
            .uniform(1, 512 - 130, (64, 2))
            .astype(np.float32)
        )
        y = patch_fwd_pallas_elem(img, posn, 128)
        sync(jnp.abs(y))

    probe("patch_fwd_pallas_elem (production shape)",
          patch_fwd_elem_production)

    width = max(len(k) for k in results)
    for k, v in results.items():
        print(f"{k:<{width}} : {v}")


if __name__ == "__main__":
    main()

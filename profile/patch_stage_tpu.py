"""Decompose patch_fwd/adj below the stage level (round 5).

patch_fwd at the production shape measures 4.74 ms but moves only ~410 MB
(0.7 ms at the measured 590 GB/s stream ceiling) and does ~17 GFLOP of
selection einsum (<0.5 ms of MXU) — neither bound explains it. This times
the two internal pieces separately:

  A. aligned-tile gather alone (vmapped dynamic_slice, no einsum)
  B. selection einsum alone (on pre-gathered tiles)
  C. fused production path (A+B)
  D. row-take alternative gather: jnp.take of whole (8, W) row bands
  E. tile-take alternative: one jnp.take of 4 KB native (8,128) tiles

to locate the overhead and evaluate gather mechanics alternatives.

Run on the chip:  python profile/patch_stage_tpu.py [B] [K]
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
    _aligned_corners,
    _padded_image_dims,
    _selection_mats,
    _split_positions,
    _tile_dims,
)

HIGH = jax.lax.Precision.HIGH


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    P, HW = 128, 1500
    rng = np.random.default_rng(0)
    jax.block_until_ready(jnp.ones((8, 128)) @ jnp.ones((128, 8)))

    img = Pair(jnp.asarray(np.stack(
        [rng.standard_normal((HW, HW)), rng.standard_normal((HW, HW))], -1
    ).astype(np.float32)))
    pos = jnp.asarray(np.stack(
        [rng.uniform(2, HW - P - 3, B), rng.uniform(2, HW - P - 3, B)], -1
    ).astype(np.float32))
    th, tw = _tile_dims(P)
    hp, wp = _padded_image_dims(HW, HW, P)
    # Real (B, C=2, th, tw) float tiles — exactly the production einsum
    # operand (the float-pair channels of a complex image).
    tiles_pre = jnp.asarray(
        rng.standard_normal((B, 2, th, tw)).astype(np.float32)
    )

    def timeit(name, fn, *args):
        @pair_jit
        def prog(*a):
            def body(c, _):
                return fn(*a, c), None

            out, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=K)
            return out

        def once():
            return to_host(prog(*args).reshape(1))

        once()
        t0 = time.perf_counter()
        once()
        once()
        dt = (time.perf_counter() - t0) / 2 / K
        print(f"{name:>44s}: {dt * 1e3:7.2f} ms", flush=True)
        return dt

    corner, frac = _split_positions(pos)
    cy, cx = _aligned_corners(corner)

    def prep(images, c):
        imf = jnp.stack([images.real, images.imag], 0) * (1 + 0 * c)
        return jnp.pad(imf, ((0, 0), (0, hp - HW), (0, wp - HW)))

    def gather_only(images, c):
        padded = prep(images, c)

        def one_tile(y0, x0):
            return jax.lax.dynamic_slice(padded, (0, y0, x0), (2, th, tw))

        tiles = jax.vmap(one_tile)(cy, cx)
        return jnp.sum(jnp.abs(tiles[:, :, ::16, ::64])) * 1e-12 + c

    timeit("A: aligned-tile gather only", gather_only, img)

    R, C = _selection_mats(P, corner, frac)

    def einsum_only(tiles, c):
        out = jnp.einsum(
            "nya,ncyx,nxb->ncab", R, tiles * (1 + 0 * c), C, precision=HIGH
        )
        return jnp.sum(jnp.abs(out)) * 1e-12 + c

    timeit("B: selection einsum only", einsum_only, tiles_pre)

    def fused(images, c):
        padded = prep(images, c)

        def one_tile(y0, x0):
            return jax.lax.dynamic_slice(padded, (0, y0, x0), (2, th, tw))

        tiles = jax.vmap(one_tile)(cy, cx)
        out = jnp.einsum("nya,ncyx,nxb->ncab", R, tiles, C, precision=HIGH)
        return jnp.sum(jnp.abs(out)) * 1e-12 + c

    timeit("C: fused gather+einsum (production)", fused, img)

    # D: take whole 8-row bands (full padded width), columns handled by C.
    nbands = hp // 8
    band0 = cy // 8
    bandsel = (
        band0[:, None] + jnp.arange(th // 8, dtype=jnp.int32)[None]
    ).reshape(-1)  # (B * th/8,)

    def row_take(images, c):
        padded = prep(images, c).reshape(2, nbands, 8, wp)
        bands = jnp.take(padded, bandsel, axis=1)  # (2, B*th/8, 8, wp)
        return jnp.sum(jnp.abs(bands[:, :, ::4, ::256])) * 1e-12 + c

    timeit("D: 8-row band take (full width)", row_take, img)

    # E: one take of native (8,128) tiles.
    ntx = wp // 128
    tile_row = (cy // 8)[:, None, None] + jnp.arange(
        th // 8, dtype=jnp.int32
    )[None, :, None]
    tile_col = (cx // 128)[:, None, None] + jnp.arange(
        tw // 128, dtype=jnp.int32
    )[None, None, :]
    flat_tile = (tile_row * ntx + tile_col).reshape(-1)  # (B*17*2,)

    def tile_take(images, c):
        padded = prep(images, c).reshape(2, nbands, 8, ntx, 128)
        q = jnp.moveaxis(padded, 3, 2).reshape(2, nbands * ntx, 8, 128)
        tiles = jnp.take(q, flat_tile, axis=1)  # (2, B*34, 8, 128)
        return jnp.sum(jnp.abs(tiles[:, :, ::4, ::64])) * 1e-12 + c

    timeit("E: native (8,128) tile take", tile_take, img)

    # F: full patch extraction via tile-take + TILED selection einsum (the
    # candidate replacement for the production path: same math as C, the
    # (y, x) contractions decomposed over the (8, 128) tile grid so the
    # take's layout feeds the MXU directly, no reassembly transpose).
    ky, kx = th // 8, tw // 128

    def take_einsum(images, c):
        # Two explicit batched matmuls: the one-shot 6-operand einsum
        # ("nuya,cnuvyx,nvxb") lowered pathologically (>20 min, round-5
        # on-chip timeout) — keep each contraction a clean batch matmul.
        padded = prep(images, c).reshape(2, nbands, 8, ntx, 128)
        q = jnp.moveaxis(padded, 3, 2).reshape(2, nbands * ntx, 8, 128)
        tiles = jnp.take(q, flat_tile, axis=1).reshape(
            2, B, ky, kx, 8, 128
        )
        Rt = R.reshape(B, ky, 8, P)
        Ct = C.reshape(B, kx, 128, P)
        t1 = jnp.einsum(
            "nuya,cnuvyx->cnavx", Rt, tiles, precision=HIGH
        )  # (2, B, P, kx, 128)
        out = jnp.einsum("cnavx,nvxb->ncab", t1, Ct, precision=HIGH)
        return jnp.sum(jnp.abs(out)) * 1e-12 + c

    timeit("F: tile-take + tiled einsum (full)", take_einsum, img)


if __name__ == "__main__":
    main()

"""Alignment quickstart: rigid registration by phase cross-correlation.

Runnable equivalent of the reference's `docs/source/examples/align.ipynb`:
shift a stack of images, recover the shifts with the upsampled-DFT
cross-correlation solver, and invert the warp.

Run: JAX_PLATFORMS=cpu python examples/align.py
"""

import numpy as np

import tike_tpu.align


def main():
    rng = np.random.default_rng(0)
    n, size = 4, 64
    yy, xx = np.mgrid[0:size, 0:size] / size
    original = np.stack(
        [
            np.exp(1j * (np.sin(7 * yy + k) * np.cos(5 * xx))).astype(
                np.complex64
            )
            for k in range(n)
        ]
    )
    true_shift = rng.uniform(-3, 3, (n, 2)).astype(np.float32)

    unaligned = tike_tpu.align.simulate(
        original, shift=true_shift, flow=None, padded_shape=None, angle=None
    )
    result = tike_tpu.align.reconstruct(
        original=original,
        unaligned=unaligned,
        algorithm="cross_correlation",
        upsample_factor=16,
    )
    err = np.abs(np.asarray(result["shift"]) - true_shift).max()
    print("true shifts:\n", np.round(true_shift, 2))
    print("recovered:\n", np.round(np.asarray(result["shift"]), 2))
    print(f"max shift error: {err:.2f} px")

    realigned = tike_tpu.align.invert(
        unaligned,
        shift=result["shift"],
        flow=None,
        unpadded_shape=None,
        angle=None,
    )
    res = np.linalg.norm(realigned - original) / np.linalg.norm(original)
    print(f"residual after inverting the warp: {res:.3f}")


if __name__ == "__main__":
    main()

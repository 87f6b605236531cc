"""Laminography quickstart: simulate and reconstruct a tilted 3D volume.

Runnable equivalent of the reference's `docs/source/examples/tomo.ipynb`
for the laminography geometry: USFFT forward model, conjugate-gradient
reconstruction, and (optionally) the voxel-projection bucket solver.

Run: JAX_PLATFORMS=cpu python examples/lamino.py
"""

import numpy as np

import tike_tpu.lamino


def main():
    n = 32
    tilt = np.pi / 3

    obj = np.zeros((n, n, n), dtype=np.complex64)
    obj[8:24, 8:24, 8:24] = 1.0 + 0.5j
    obj[12:20, 12:20, 12:20] = 0.2 - 0.1j
    theta = np.linspace(0, 2 * np.pi, 32, endpoint=False).astype(np.float32)

    data = tike_tpu.lamino.simulate(obj, theta, tilt, eps=1e-6, upsample=2)
    print("projections:", data.shape, data.dtype)

    result = tike_tpu.lamino.reconstruct(
        data,
        theta,
        tilt,
        algorithm="cgrad",
        num_iter=8,
        rtol=1e-3,
        eps=1e-6,
        upsample=2,
        cg_iter=4,
    )
    costs = result["cost"]
    err = np.linalg.norm(result["obj"] - obj) / np.linalg.norm(obj)
    print("cost series:", " ".join(f"{c:1.3e}" for c in costs))
    print(f"relative reconstruction error: {err:.3f}")

    # The bucket (voxel-projection) solver trades accuracy for memory; it is
    # the model-parallel path for volumes larger than per-chip HBM
    # (obj_split shards the voxel grid over a device mesh).
    import tike_tpu.lamino.bucket as bucket

    bdata = bucket.simulate(obj, theta, tilt, eps=0.2)
    bresult = bucket.reconstruct(
        bdata, theta, tilt, algorithm="bucket", num_iter=4, eps=0.2, cg_iter=4
    )
    print("bucket cost series:", " ".join(f"{c:1.3e}" for c in bresult["cost"]))


if __name__ == "__main__":
    main()

"""Device-mesh parallelism for tike-tpu.

Replaces the reference's entire communicators layer
(`/root/reference/src/tike/communicators/`: ThreadPool + MPIComm + stream
pipelines, ~1500 LoC of explicit device-to-device copies) with a single
jax.sharding.Mesh. The parallel decomposition is data-parallel over
diffraction patterns (the reference's primary axis, SURVEY.md §2.3):

- diffraction data and scan positions are sharded along the pattern axis;
- psi / probe / eigen probes are replicated;
- the scatter-add of the object numerator and the sum-reduction of the probe
  numerator become XLA collectives (psum over ICI) inserted automatically by
  GSPMD — the hand-written `pool.reduce_gpu` / `MPI.Allreduce` of the
  reference collapse into compiler-inserted all-reduces.

Data is stored batch-major (num_batch, L, ...) with L padded to a multiple of
the device count, so per-batch slicing never crosses shard boundaries.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """Create a 1D mesh over the pattern (data-parallel) axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for replicated arrays (psi, probe, options state)."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Sharding that partitions the given axis over the mesh."""
    spec = [None] * axis + [BATCH_AXIS]
    return NamedSharding(mesh, P(*spec))

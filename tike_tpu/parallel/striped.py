"""Row-striped (spatial/model-parallel) ptychographic reconstruction.

TPU-native equivalent of the reference's object decomposition, where each
GPU reconstructs a row stripe of psi covering its own scan positions plus a
probe-width overlap, neighbors reconcile the overlap with a linear
cross-fade each epoch, and the stripes are stitched at the end
(`ptycho/ptycho.py:371-396,491-502`, `pool.py:415-476`, `object.py:154-167`
in `/root/reference/src/tike`).

Design here: one `shard_map` over the device mesh. Every device owns

- a local psi window of R = Hs + 2*halo rows (stripe height Hs = ceil(H/n),
  halo >= probe_width + 1 so every local window read/write stays in-bounds),
- its stripe's diffraction patterns and scan positions (rebased to local
  row coordinates, padded to a common count with a validity mask).

Each epoch runs the compact rPIE update locally (preconditioners, batch
gradient, object update), all-reduces the probe numerator/preconditioner
across the mesh (`psum`, the reference's Allreduce_mean), and reconciles
the 2*halo seam rows with the neighbor via `ppermute` + linear cross-fade
(both neighbors compute the identical blend, so the duplicated state stays
consistent). The default replicated path remains preferred when psi fits
in HBM; this module is the scaling path for objects larger than per-chip
HBM, and the TPU analog of the reference's multi-GPU psi decomposition.
"""

from __future__ import annotations

import dataclasses
import logging
import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tike_tpu.ops.ptycho import PtychoConfig
from tike_tpu.ptycho.solvers._preconditioner import (
    _probe_precond_math,
    _psi_precond_math,
)
from tike_tpu.ptycho.solvers.rpie import _batch_gradients_math
from tike_tpu.utils.pairs import pair_jit
from tike_tpu.utils.transfer import to_host

from . import BATCH_AXIS

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class StripePlan:
    """Host-side geometry of a row-striped decomposition."""

    ndev: int
    stripe_height: int  # Hs: interior rows per stripe
    halo: int  # overlap rows shared with each neighbor
    local_height: int  # R = Hs + 2*halo
    width: int
    assignment: np.ndarray  # (N,) stripe index of each scan position
    counts: np.ndarray  # (ndev,) positions per stripe
    capacity: int  # padded per-stripe position count


def plan_stripes(
    scan: np.ndarray,
    object_shape: typing.Tuple[int, int],
    probe_width: int,
    ndev: int,
) -> StripePlan:
    """Assign scan positions to row stripes (`cluster.py:176-262` analog)."""
    h, w = object_shape
    hs = -(-h // ndev)
    halo = probe_width + 8
    assignment = np.clip(
        (np.floor(scan[:, 0]).astype(np.int64)) // hs, 0, ndev - 1
    )
    counts = np.bincount(assignment, minlength=ndev)
    capacity = int(counts.max())
    return StripePlan(
        ndev=ndev,
        stripe_height=hs,
        halo=halo,
        local_height=hs + 2 * halo,
        width=w,
        assignment=assignment,
        counts=counts,
        capacity=capacity,
    )


def _shard_inputs(plan: StripePlan, data, scan, psi):
    """Build per-device stacked arrays (leading axis = device)."""
    nd, cap = plan.ndev, plan.capacity
    det = data.shape[-1]
    d, h, w = psi.shape
    data_s = np.zeros((nd, cap, det, det), np.float32)
    scan_s = np.zeros((nd, cap, 2), np.float32)
    mask_s = np.zeros((nd, cap), np.float32)
    for k in range(nd):
        sel = np.flatnonzero(plan.assignment == k)
        n = len(sel)
        data_s[k, :n] = data[sel]
        local = scan[sel].copy()
        # Rebase to local rows: global row r -> r - k*Hs + halo.
        local[:, 0] += plan.halo - k * plan.stripe_height
        scan_s[k, :n] = local
        if n:
            scan_s[k, n:] = local[0]
        else:
            scan_s[k, :] = (plan.halo + 1, 1)
        mask_s[k, :n] = 1.0
    # Local psi windows: rows [k*Hs - halo, k*Hs + Hs + halo), zero-padded
    # outside the global object.
    psi_pad = np.pad(
        np.asarray(psi),
        ((0, 0), (plan.halo, plan.halo + nd * plan.stripe_height - h), (0, 0)),
        constant_values=1.0,
    )
    psi_s = np.stack(
        [
            psi_pad[
                :,
                k * plan.stripe_height : k * plan.stripe_height
                + plan.local_height,
            ]
            for k in range(nd)
        ]
    ).astype(np.complex64)
    return data_s, scan_s, mask_s, psi_s


def stitch(plan: StripePlan, psi_s: np.ndarray, h: int) -> np.ndarray:
    """Crop each stripe's interior rows and concatenate (`join_psi`)."""
    parts = [
        psi_s[k][:, plan.halo : plan.halo + plan.stripe_height]
        for k in range(plan.ndev)
    ]
    return np.concatenate(parts, axis=-2)[:, :h]


def _striped_epoch_math(
    cfg: PtychoConfig,
    plan_halo: int,
    plan_hs: int,
    ndev: int,
    alpha: float,
    data,  # (cap, det, det) local
    scan,  # (cap, 2) local
    mask,  # (cap,)
    psi,  # (D, R, W) local
    probe,
    measured_pixels,
):
    """One compact rPIE epoch on this device's stripe (inside shard_map)."""
    idx = jnp.arange(scan.shape[0], dtype=jnp.int32)
    nvalid = jnp.maximum(jnp.sum(mask), 1.0)

    psi_pre = _psi_precond_math(cfg, psi, scan, probe, mask)
    probe_pre = _probe_precond_math(cfg, psi, scan, mask)
    probe_pre = jax.lax.psum(probe_pre, BATCH_AXIS)

    costs, psi_num, probe_num, _ = _batch_gradients_math(
        cfg,
        data,
        scan,
        idx,
        mask,
        psi,
        probe,
        None,
        None,
        measured_pixels,
        0.5,
        0.5,
        1.0,
        noise_model="gaussian",
        steplength_usemodes="all_modes",
        recover_probe=True,
    )
    # Probe numerator: mean over devices weighted by valid counts
    # (the reference's Allreduce_mean, `comm.py:96-110`).
    probe_num = jax.lax.psum(probe_num, BATCH_AXIS)

    deno = (1 - alpha) * psi_pre + alpha * jnp.abs(psi_pre).max(
        axis=(-2, -1), keepdims=True
    )
    psi = psi + psi_num / deno
    ppre = jnp.abs(probe_pre[0])
    probe = probe + probe_num[0] / ((1 - alpha) * ppre + alpha * ppre.max())

    cost = jax.lax.psum(jnp.sum(costs * mask), BATCH_AXIS) / jax.lax.psum(
        nvalid, BATCH_AXIS
    )

    # Halo reconciliation: blend the 2*halo seam rows with each neighbor.
    # Both sides compute the identical cross-fade, so duplicated rows agree.
    w2 = 2 * plan_halo
    i = jax.lax.axis_index(BATCH_AXIS)
    seam_bot = jax.lax.dynamic_slice_in_dim(psi, plan_hs, w2, axis=-2)
    seam_top = jax.lax.dynamic_slice_in_dim(psi, 0, w2, axis=-2)
    from_below = jax.lax.ppermute(
        seam_top, BATCH_AXIS, [(j, (j - 1) % ndev) for j in range(ndev)]
    )
    from_above = jax.lax.ppermute(
        seam_bot, BATCH_AXIS, [(j, (j + 1) % ndev) for j in range(ndev)]
    )
    ramp = jnp.linspace(0.0, 1.0, w2 + 2, dtype=jnp.float32)[1:-1][
        None, :, None
    ]
    blended_bot = (1 - ramp) * seam_bot + ramp * from_below
    blended_top = (1 - ramp) * from_above + ramp * seam_top
    new_bot = jnp.where(i < ndev - 1, blended_bot, seam_bot)
    new_top = jnp.where(i > 0, blended_top, seam_top)
    psi = jax.lax.dynamic_update_slice_in_dim(psi, new_bot, plan_hs, axis=-2)
    psi = jax.lax.dynamic_update_slice_in_dim(psi, new_top, 0, axis=-2)

    return psi, probe, cost


def reconstruct_striped(
    data: np.ndarray,
    psi: np.ndarray,
    probe: np.ndarray,
    scan: np.ndarray,
    *,
    mesh: Mesh,
    num_iter: int,
    alpha: float = 0.05,
) -> typing.Tuple[np.ndarray, np.ndarray, list]:
    """Row-striped compact-rPIE reconstruction over a device mesh.

    The scaling path for objects larger than per-chip HBM: psi lives only as
    per-device stripes; probe is replicated and all-reduced. Supports the
    compact rPIE/gaussian configuration (the reference's multi-GPU default).

    Returns (stitched psi (D, H, W), probe, costs per epoch).
    """
    ndev = mesh.size
    d, h, w = psi.shape
    p = probe.shape[-1]
    plan = plan_stripes(np.asarray(scan), (h, w), p, ndev)
    data_s, scan_s, mask_s, psi_s = _shard_inputs(
        plan, np.asarray(data), np.asarray(scan), psi
    )
    cfg = PtychoConfig(
        probe_shape=p,
        detector_shape=data.shape[-1],
        nz=plan.local_height,
        n=w,
    )
    measured = jnp.ones((cfg.detector_shape, cfg.detector_shape), bool)

    dev = P(BATCH_AXIS)
    rep = P()

    def epoch(data_b, scan_b, mask_b, psi_b, probe_r):
        psi_new, probe_new, cost = _striped_epoch_math(
            cfg,
            plan.halo,
            plan.stripe_height,
            ndev,
            alpha,
            data_b[0],
            scan_b[0],
            mask_b[0],
            psi_b[0],
            probe_r,
            measured,
        )
        return psi_new[None], probe_new, cost

    # check_vma=False: the patch-op scans initialize their accumulators
    # with unvarying zeros, which the varying-manual-axes analysis rejects
    # even though the computation is correct per device.
    epoch_sm = pair_jit(
        jax.shard_map(
            epoch,
            mesh=mesh,
            in_specs=(dev, dev, dev, dev, rep),
            out_specs=(dev, rep, rep),
            check_vma=False,
        )
    )

    sharding = NamedSharding(mesh, dev)
    psi_dev = jax.device_put(jnp.asarray(psi_s), sharding)
    data_dev = jax.device_put(jnp.asarray(data_s), sharding)
    scan_dev = jax.device_put(jnp.asarray(scan_s), sharding)
    mask_dev = jax.device_put(jnp.asarray(mask_s), sharding)
    probe_dev = jnp.asarray(probe)

    costs = []
    for _ in range(num_iter):
        psi_dev, probe_dev, cost = epoch_sm(
            data_dev, scan_dev, mask_dev, psi_dev, probe_dev
        )
        costs.append(float(to_host(jnp.reshape(cost, (1,)))[0]))

    psi_host = to_host(psi_dev)
    return stitch(plan, psi_host, h), to_host(probe_dev), costs

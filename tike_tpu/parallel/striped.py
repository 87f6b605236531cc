"""Row-striped (spatial/model-parallel) ptychographic reconstruction.

TPU-native equivalent of the reference's object decomposition, where each
GPU reconstructs a row stripe of psi covering its own scan positions plus a
probe-width overlap, neighbors reconcile the overlap with a linear
cross-fade each epoch, and the stripes are stitched at the end
(`ptycho/ptycho.py:371-396,491-502`, `pool.py:415-476`, `object.py:154-167`
in `/root/reference/src/tike`).

Design here: one `shard_map` over the device mesh. Every device owns

- a local psi window of R = Hs + 2*halo rows (stripe height Hs = ceil(H/n),
  halo >= probe_width + 1 so every local window read/write stays in-bounds;
  the extra margin absorbs fractional offsets and position drift),
- its stripe's diffraction patterns and scan positions (rebased to local
  row coordinates, padded to a common count with a validity mask).

Each epoch runs the solver update locally (rPIE compact numerators, or the
LSQML joint-step update), reconciles the probe across the mesh (`psum`, the
reference's Allreduce_mean, `comm.py:96-110`), and blends the 2*halo seam
rows with the neighbor via `ppermute` + linear cross-fade (both neighbors
compute the identical blend, so the duplicated state stays consistent).
The replicated path remains the default when psi fits in HBM; this module
is the scaling path for objects larger than per-chip HBM and is reachable
from the public driver via ``Reconstruction(..., object_sharding="striped")``.
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
from tike_tpu.ptycho.solvers.lstsq import _lstsq_batch_math
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
    position_margin: int = 8,
) -> StripePlan:
    """Assign scan positions to row stripes (`cluster.py:176-262` analog).

    ``position_margin`` extends the halo beyond the probe footprint so that
    fractional offsets and (bounded) position-correction drift never read
    or write outside the local window.
    """
    h, w = object_shape
    hs = -(-h // ndev)
    halo = probe_width + 1 + max(int(position_margin), 1)
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
    solver: str,
    noise_model: str,
    num_batch: int,
    data,  # (cap, det, det) local, cap = num_batch * lb
    scan,  # (cap, 2) local
    mask,  # (cap,)
    psi,  # (D, R, W) local
    probe,
    measured_pixels,
):
    """One solver epoch on this device's stripe (inside shard_map).

    The stripe's positions are processed in ``num_batch`` chunks with
    compact (accumulate-then-update) semantics: peak forward-model memory
    is cap/num_batch patterns, the stripe analog of the reference's
    mini-batch loop — and the knob that keeps >HBM stripes feasible.
    """
    cap = scan.shape[0]
    lb = cap // num_batch
    # True valid count: 0 for empty stripes so they carry no weight in the
    # probe mean or the cost denominator (the reference's Allreduce_mean
    # weights by per-rank counts, `comm.py:96-110`).
    nvalid = jnp.sum(mask)

    psi_pre = _psi_precond_math(cfg, psi, scan, probe, mask)

    if solver == "lstsq":
        # LSQML joint-step updates on this stripe's positions. Betas are
        # estimated per chunk (each reference GPU solves its own 2x2
        # systems); the object update accumulates across chunks (compact
        # path of `lstsq_grad`), the probe updates per chunk, and the probe
        # is reconciled across stripes after the epoch.
        from tike_tpu.ptycho.solvers.lstsq import (
            _precondition_object_update,
        )

        def chunk_step(carry, b):
            probe_c, obj_sum, beta_sum, beta_w, costs_acc = carry
            idx = b * lb + jnp.arange(lb, dtype=jnp.int32)
            bmask = jax.lax.dynamic_slice_in_dim(mask, b * lb, lb)
            data_b = jax.lax.dynamic_slice_in_dim(data, b * lb, lb)
            out = _lstsq_batch_math(
                cfg,
                data_b,
                scan,
                idx,
                bmask,
                psi,
                probe_c,
                None,
                None,
                measured_pixels,
                psi_pre,
                0.5,
                0.5,
                1.0,
                num_batch=float(num_batch),
                noise_model=noise_model,
                steplength_usemodes="all_modes",
                recover_psi=True,
                recover_probe=True,
                recover_positions=False,
            )
            has_valid = (jnp.sum(bmask) > 0).astype(jnp.float32)
            obj_sum = obj_sum + jnp.where(
                jnp.isfinite(out["object_upd_sum"]),
                out["object_upd_sum"],
                0,
            )
            beta_sum = beta_sum + out["beta_object"] * has_valid
            beta_w = beta_w + has_valid
            dprobe = out["beta_probe"] * out["m_probe_update"]
            probe_c = probe_c + jnp.where(jnp.isfinite(dprobe), dprobe, 0)
            costs_acc = jax.lax.dynamic_update_slice_in_dim(
                costs_acc, out["costs"], b * lb, axis=0
            )
            return (probe_c, obj_sum, beta_sum, beta_w, costs_acc), None

        carry0 = (
            probe,
            jnp.zeros_like(psi),
            jnp.zeros((1,), psi.real.dtype),  # beta_object is shape (1,)
            jnp.zeros((), jnp.float32),
            jnp.zeros(cap, psi.real.dtype),
        )
        (probe_new, obj_sum, beta_sum, beta_w, costs), _ = jax.lax.scan(
            chunk_step, carry0, jnp.arange(num_batch)
        )
        beta = beta_sum / jnp.maximum(beta_w, 1.0)
        # Empty stripes (no scan positions land in this device's rows)
        # produce 0/0 in the preconditioned update; contribute nothing.
        dpsi = beta * _precondition_object_update(obj_sum, psi_pre)
        psi = psi + jnp.where(jnp.isfinite(dpsi), dpsi, 0)
        # Weighted mean over stripes (the reference's Allreduce_mean);
        # empty stripes contribute weight 0.
        probe = jax.lax.psum(probe_new * nvalid, BATCH_AXIS) / jnp.maximum(
            jax.lax.psum(nvalid, BATCH_AXIS), 1.0
        )
    else:
        probe_pre = _probe_precond_math(cfg, psi, scan, mask)
        probe_pre = jax.lax.psum(probe_pre, BATCH_AXIS)

        def chunk_step(carry, b):
            psi_num_acc, probe_num_acc, costs_acc = carry
            idx = b * lb + jnp.arange(lb, dtype=jnp.int32)
            bmask = jax.lax.dynamic_slice_in_dim(mask, b * lb, lb)
            data_b = jax.lax.dynamic_slice_in_dim(data, b * lb, lb)
            costs_b, psi_num, probe_num, _ = _batch_gradients_math(
                cfg,
                data_b,
                scan,
                idx,
                bmask,
                psi,
                probe,
                None,
                None,
                measured_pixels,
                0.5,
                0.5,
                1.0,
                noise_model=noise_model,
                steplength_usemodes="all_modes",
                recover_probe=True,
            )
            costs_acc = jax.lax.dynamic_update_slice_in_dim(
                costs_acc, costs_b, b * lb, axis=0
            )
            return (
                psi_num_acc + psi_num,
                probe_num_acc + probe_num,
                costs_acc,
            ), None

        carry0 = (
            jnp.zeros_like(psi),
            jnp.zeros(
                (psi.shape[0], *probe.shape), probe.dtype
            ),
            jnp.zeros(cap, psi.real.dtype),
        )
        (psi_num, probe_num, costs), _ = jax.lax.scan(
            chunk_step, carry0, jnp.arange(num_batch)
        )
        # Probe numerator summed over devices (the reference's Allreduce).
        probe_num = jax.lax.psum(probe_num, BATCH_AXIS)
        deno = (1 - alpha) * psi_pre + alpha * jnp.abs(psi_pre).max(
            axis=(-2, -1), keepdims=True
        )
        # Empty stripes have an all-zero preconditioner; contribute nothing
        # rather than 0/0.
        ok = jnp.abs(deno) > 0
        psi = psi + jnp.where(ok, psi_num / jnp.where(ok, deno, 1), 0)
        ppre = jnp.abs(probe_pre[0])
        probe = probe + probe_num[0] / (
            (1 - alpha) * ppre + alpha * ppre.max()
        )

    cost = jax.lax.psum(jnp.sum(costs * mask), BATCH_AXIS) / jnp.maximum(
        jax.lax.psum(nvalid, BATCH_AXIS), 1.0
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


@dataclasses.dataclass
class StripedState:
    """Device-resident state of a striped reconstruction in progress."""

    plan: StripePlan
    cfg: PtychoConfig
    epoch_fn: typing.Callable
    psi: jax.Array  # (ndev, D, R, W) device-sharded local windows
    probe: jax.Array
    data: jax.Array
    scan: jax.Array
    mask: jax.Array
    height: int  # global object rows (for stitching)


def estimate_probe_rescale(
    data: np.ndarray,
    psi: np.ndarray,
    probe: np.ndarray,
    scan: np.ndarray,
    sample: int = 256,
    rng: typing.Optional[np.random.Generator] = None,
) -> float:
    """Host-side probe power rescale factor (`ptycho/ptycho.py:873-972`).

    By Parseval (ortho-norm FFT), the modeled far-field energy of a
    position equals sum_px |patch|^2 * sum_modes |probe|^2, so the rescale
    sqrt(sum data / sum model) is computed from bilinear patches alone --
    no forward FFT and no device-resident full object, which matters in
    striped mode where psi never materializes on one device.
    """
    rng = np.random.default_rng(0) if rng is None else rng
    n = scan.shape[0]
    sel = (
        np.arange(n)
        if n <= sample
        else rng.choice(n, size=sample, replace=False)
    )
    p = probe.shape[-1]
    probe_power = np.sum(np.abs(probe[0, 0]) ** 2, axis=0)  # (P, P)
    corner = np.floor(scan[sel]).astype(np.int64)
    frac = scan[sel] - corner
    model = 0.0
    for c, f in zip(corner, frac):
        win = psi[0, c[0] : c[0] + p + 1, c[1] : c[1] + p + 1]
        fy, fx = f
        patch = (
            (1 - fy) * (1 - fx) * win[:-1, :-1]
            + (1 - fy) * fx * win[:-1, 1:]
            + fy * (1 - fx) * win[1:, :-1]
            + fy * fx * win[1:, 1:]
        )
        model += float(np.sum(np.abs(patch) ** 2 * probe_power))
    measured = float(np.sum(data[sel]))
    return float(np.sqrt(measured / (model + 1e-32)))


def setup_striped(
    data: np.ndarray,
    psi: np.ndarray,
    probe: np.ndarray,
    scan: np.ndarray,
    *,
    mesh: Mesh,
    solver: str = "rpie",
    noise_model: str = "gaussian",
    alpha: float = 0.05,
    position_margin: int = 8,
    num_batch: int = 1,
) -> StripedState:
    """Shard the problem into row stripes and compile the epoch program.

    ``num_batch`` chunks each stripe's positions with compact
    (accumulate-then-update) semantics, bounding the per-chunk forward
    model to capacity/num_batch patterns.
    """
    if solver not in ("rpie", "lstsq"):
        raise ValueError(f"striped mode supports rpie/lstsq, not {solver!r}")
    ndev = mesh.size
    d, h, w = psi.shape
    p = probe.shape[-1]
    plan = plan_stripes(
        np.asarray(scan), (h, w), p, ndev, position_margin=position_margin
    )
    num_batch = max(1, min(int(num_batch), max(plan.capacity, 1)))
    if plan.capacity % num_batch:
        # Pad the per-stripe capacity so chunks are equal-sized.
        plan = dataclasses.replace(
            plan,
            capacity=(-(-plan.capacity // num_batch)) * num_batch,
        )
    data_s, scan_s, mask_s, psi_s = _shard_inputs(
        plan, np.asarray(data), np.asarray(scan), np.asarray(psi)
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
            solver,
            noise_model,
            num_batch,
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
    return StripedState(
        plan=plan,
        cfg=cfg,
        epoch_fn=epoch_sm,
        psi=jax.device_put(jnp.asarray(psi_s), sharding),
        probe=jnp.asarray(probe),
        data=jax.device_put(jnp.asarray(data_s), sharding),
        scan=jax.device_put(jnp.asarray(scan_s), sharding),
        mask=jax.device_put(jnp.asarray(mask_s), sharding),
        height=h,
    )


def striped_epoch(state: StripedState) -> float:
    """Advance one epoch in place; return the mean cost."""
    state.psi, state.probe, cost = state.epoch_fn(
        state.data, state.scan, state.mask, state.psi, state.probe
    )
    return float(to_host(jnp.reshape(cost, (1,)))[0])


def striped_result(
    state: StripedState,
) -> typing.Tuple[np.ndarray, np.ndarray]:
    """Stitch the stripes back into (psi (D, H, W), probe)."""
    return (
        stitch(state.plan, to_host(state.psi), state.height),
        to_host(state.probe),
    )


def reconstruct_striped(
    data: np.ndarray,
    psi: np.ndarray,
    probe: np.ndarray,
    scan: np.ndarray,
    *,
    mesh: Mesh,
    num_iter: int,
    solver: str = "rpie",
    noise_model: str = "gaussian",
    alpha: float = 0.05,
    num_batch: int = 1,
) -> typing.Tuple[np.ndarray, np.ndarray, list]:
    """Row-striped reconstruction over a device mesh (functional API).

    The scaling path for objects larger than per-chip HBM: psi lives only as
    per-device stripes; the probe is replicated and all-reduced. Supports
    the compact rPIE and LSQML gaussian/poisson configurations with
    multi-mode probes (the reference's multi-GPU default behavior).

    Returns (stitched psi (D, H, W), probe, costs per epoch).
    """
    state = setup_striped(
        data,
        np.asarray(psi),
        probe,
        scan,
        mesh=mesh,
        solver=solver,
        noise_model=noise_model,
        alpha=alpha,
        num_batch=num_batch,
    )
    costs = [striped_epoch(state) for _ in range(num_iter)]
    psi_out, probe_out = striped_result(state)
    return psi_out, probe_out, costs

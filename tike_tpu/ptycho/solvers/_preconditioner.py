"""Object and probe preconditioners.

TPU-native equivalent of
`/root/reference/src/tike/ptycho/solvers/_preconditioner.py`:
- psi preconditioner = sum over positions of |probe|^2 scatter-added into the
  object frame, per slice (`_preconditioner.py:48-104`);
- probe preconditioner = sum over positions of |patches|^2, per slice
  (`_preconditioner.py:116-167`).

Each is a single jitted XLA program over all positions (the reference streams
chunks because its data is host-pinned; ours is device-resident).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tike_tpu.ops.patch import patch_adj, patch_fwd
from tike_tpu.ops.propagation import fresnel_fwd
from tike_tpu.ops.ptycho import PtychoConfig
from tike_tpu.utils.pairs import pair_jit
from .options import PtychoParameters

_jit_add = jax.jit(lambda a, b: jax.tree_util.tree_map(jnp.add, a, b))


def _psi_precond_math(cfg: PtychoConfig, psi, scan, probe, mask=None):
    """Return (D, H, W) sum of |illumination|^2 at each object pixel.

    `mask` (N,) optionally zeroes padded batch slots.
    """
    n = scan.shape[0]
    p = cfg.probe_shape
    w = jnp.ones(n, probe.real.dtype) if mask is None else mask

    # Real-valued throughout: |probe|^2 is real, so the patch scatter runs
    # on ONE float channel instead of a complex pair (2x less MXU work),
    # and the result needs no pair conversion at program boundaries.
    probe_amp = jnp.sum(
        (probe[0, 0] * jnp.conj(probe[0, 0])).real, axis=0
    )  # (P, P) f32
    slices = [
        patch_adj(
            probe_amp[None] * w[:, None, None].astype(probe_amp.dtype),
            scan,
            (cfg.nz, cfg.n),
            precision=jax.lax.Precision.HIGH,
        )
    ]

    if cfg.nslices > 1:
        prop = cfg.propagator()
        probe1 = jnp.broadcast_to(probe[0, 0], (n, probe.shape[-3], p, p))
        for i in range(1, cfg.nslices):
            patches = patch_fwd(
                psi[i - 1], scan, p, precision=jax.lax.Precision.HIGH
            )
            probe1 = fresnel_fwd(patches[:, None] * probe1, prop)
            amp = jnp.sum(
                (probe1 * jnp.conj(probe1)).real, axis=1
            )  # (N, P, P) f32
            slices.append(
                patch_adj(
                    amp * w[:, None, None].astype(amp.dtype),
                    scan,
                    (cfg.nz, cfg.n),
                    precision=jax.lax.Precision.HIGH,
                )
            )

    return jnp.stack(slices)


def _probe_precond_math(cfg: PtychoConfig, psi, scan, mask=None):
    """Return (D, P, P) sum of |object patches|^2 per slice."""
    w = (
        jnp.ones(scan.shape[0], psi.real.dtype)
        if mask is None
        else mask
    )
    slices = []
    for i in range(cfg.nslices):
        patches = patch_fwd(
            psi[i], scan, cfg.probe_shape,
            precision=jax.lax.Precision.HIGH,
        )
        slices.append(
            jnp.sum(
                (patches * jnp.conj(patches)).real
                * w[:, None, None].astype(jnp.float32),
                axis=0,
            )
        )
    return jnp.stack(slices)


@pair_jit(static_argnames=("cfg",))
def psi_preconditioner(cfg, psi, scan, probe, mask=None):
    """Jitted wrapper around :func:`_psi_precond_math`."""
    return _psi_precond_math(cfg, psi, scan, probe, mask)


@pair_jit(static_argnames=("cfg",))
def probe_preconditioner(cfg, psi, scan, mask=None):
    """Jitted wrapper around :func:`_probe_precond_math`."""
    return _probe_precond_math(cfg, psi, scan, mask)


def update_preconditioners(
    cfg: PtychoConfig,
    parameters: PtychoParameters,
    batches=None,
) -> PtychoParameters:
    """Refresh probe and object preconditioners (`_preconditioner.py:170-209`).

    When `batches` (padded index matrix + mask) is given, the scan is
    processed one batch slice at a time so every call reuses a single
    compiled program of fixed shape (the reference streams 64-pattern
    chunks for the same reason).
    """
    if batches is None:
        if parameters.object_options:
            parameters.object_options.preconditioner = psi_preconditioner(
                cfg, parameters.psi, parameters.scan, parameters.probe
            )
        if parameters.probe_options:
            parameters.probe_options.preconditioner = probe_preconditioner(
                cfg, parameters.psi, parameters.scan
            )
        return parameters

    batch_idx, batch_mask = batches
    want_psi = parameters.object_options is not None
    want_probe = parameters.probe_options is not None
    psi_pre, probe_pre = _preconditioner_epoch_program(
        cfg,
        parameters.psi,
        parameters.scan,
        parameters.probe,
        jnp.asarray(batch_idx),
        jnp.asarray(batch_mask),
        want_psi=want_psi,
        want_probe=want_probe,
    )
    if want_psi:
        parameters.object_options.preconditioner = psi_pre
    if want_probe:
        parameters.probe_options.preconditioner = probe_pre
    return parameters


@pair_jit(static_argnames=("cfg", "want_psi", "want_probe"))
def _preconditioner_epoch_program(
    cfg: PtychoConfig,
    psi,
    scan,
    probe,
    batch_idx,
    batch_mask,
    *,
    want_psi: bool,
    want_probe: bool,
):
    """Both preconditioners for the whole scan as one XLA program.

    lax.scan over the padded batch slices; one dispatch instead of
    2 * num_batch.
    """
    from tike_tpu.ops.patch import patch_adj, patch_fwd

    nb = batch_idx.shape[0]

    def body(carry, inp):
        psi_pre, probe_pre = carry
        idx, bmask = inp
        scan_b = jnp.take(scan, idx, axis=0)
        if want_psi:
            psi_pre = psi_pre + _psi_precond_math(
                cfg, psi, scan_b, probe, bmask
            )
        if want_probe:
            probe_pre = probe_pre + _probe_precond_math(
                cfg, psi, scan_b, bmask
            )
        return (psi_pre, probe_pre), None

    psi_pre0 = jnp.zeros((cfg.nslices, cfg.nz, cfg.n), jnp.complex64)
    probe_pre0 = jnp.zeros(
        (cfg.nslices, cfg.probe_shape, cfg.probe_shape), jnp.complex64
    )
    (psi_pre, probe_pre), _ = jax.lax.scan(
        body, (psi_pre0, probe_pre0), (batch_idx, batch_mask)
    )
    return psi_pre, probe_pre

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
from .options import PtychoParameters


@functools.partial(jax.jit, static_argnames=("cfg",))
def psi_preconditioner(cfg: PtychoConfig, psi, scan, probe):
    """Return (D, H, W) sum of |illumination|^2 at each object pixel."""
    n = scan.shape[0]
    p = cfg.probe_shape

    probe_amp = jnp.sum(probe[0, 0] * jnp.conj(probe[0, 0]), axis=0)  # (P, P)
    slices = [
        patch_adj(
            jnp.broadcast_to(probe_amp, (n, p, p)), scan, (cfg.nz, cfg.n)
        )
    ]

    if cfg.nslices > 1:
        prop = cfg.propagator()
        probe1 = jnp.broadcast_to(probe[0, 0], (n, probe.shape[-3], p, p))
        for i in range(1, cfg.nslices):
            patches = patch_fwd(psi[i - 1], scan, p)
            probe1 = fresnel_fwd(patches[:, None] * probe1, prop)
            amp = jnp.sum(probe1 * jnp.conj(probe1), axis=1)  # (N, P, P)
            slices.append(patch_adj(amp, scan, (cfg.nz, cfg.n)))

    return jnp.stack(slices)


@functools.partial(jax.jit, static_argnames=("cfg",))
def probe_preconditioner(cfg: PtychoConfig, psi, scan):
    """Return (D, P, P) sum of |object patches|^2 per slice."""
    slices = []
    for i in range(cfg.nslices):
        patches = patch_fwd(psi[i], scan, cfg.probe_shape)
        slices.append(jnp.sum(patches * jnp.conj(patches), axis=0))
    return jnp.stack(slices)


def update_preconditioners(
    cfg: PtychoConfig, parameters: PtychoParameters
) -> PtychoParameters:
    """Refresh probe and object preconditioners (`_preconditioner.py:170-209`)."""
    if parameters.object_options:
        parameters.object_options.preconditioner = psi_preconditioner(
            cfg, parameters.psi, parameters.scan, parameters.probe
        )
    if parameters.probe_options:
        parameters.probe_options.preconditioner = probe_preconditioner(
            cfg, parameters.psi, parameters.scan
        )
    return parameters

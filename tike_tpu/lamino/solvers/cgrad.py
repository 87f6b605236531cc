"""Conjugate-gradient solver for laminography.

TPU-native equivalent of `/root/reference/src/tike/lamino/solvers/cgrad.py`.
The reference's pool.map + Allreduce structure collapses into jitted cost and
gradient functions; with a sharded theta axis, XLA inserts the reductions.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

import tike_tpu.linalg
import tike_tpu.opt
from tike_tpu.ops.lamino import (
    LaminoConfig,
    lamino_adj,
    lamino_cost,
    lamino_fwd,
    lamino_grad,
)

logger = logging.getLogger(__name__)


def _estimate_step_length(obj, theta, cfg):
    """Step-length scale = |F*Fm| / |m| (`cgrad.py:9-24`)."""
    from tike_tpu.utils.transfer import scalar

    outnback = lamino_adj(cfg, lamino_fwd(cfg, obj, theta), theta)
    s = scalar(
        2 * tike_tpu.linalg.norm(outnback) / tike_tpu.linalg.norm(obj),
        default=float("nan"),
    )
    return s if np.isfinite(s) else 1.0


def cgrad(
    cfg: LaminoConfig,
    data,
    theta,
    obj,
    cg_iter=4,
    step_length=1,
    **kwargs,
):
    """One outer iteration of CG for the laminography problem."""
    if step_length == 1:
        step_length = _estimate_step_length(obj, theta, cfg)

    def cost_function(u):
        from tike_tpu.utils.transfer import scalar

        return scalar(lamino_cost(cfg, data, theta, u))

    def grad(u):
        return lamino_grad(cfg, data, theta, u)

    obj, cost = tike_tpu.opt.conjugate_gradient(
        None,
        x=obj,
        cost_function=cost_function,
        grad=grad,
        num_iter=cg_iter,
        step_length=step_length,
    )
    logger.info("%10s cost is %+12.5e", "object", cost)
    return {"obj": obj, "cost": cost, "step_length": step_length}

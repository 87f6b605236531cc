"""Conjugate-gradient solver for laminography.

TPU-native equivalent of `/root/reference/src/tike/lamino/solvers/cgrad.py`.
The reference's pool.map + Allreduce structure collapses into jitted cost and
gradient functions; with a sharded theta axis, XLA inserts the reductions.
"""

from __future__ import annotations

import logging

import numpy as np

import tike_tpu.linalg
import tike_tpu.opt
from tike_tpu.ops.lamino import (
    LaminoConfig,
    lamino_cost_p,
    lamino_grad_p,
    lamino_step_scale,
)
from tike_tpu.utils.pairs import pair_jit

logger = logging.getLogger(__name__)

# Module-level so the jit cache survives across outer CG iterations.
_direction_dy_p = pair_jit(tike_tpu.opt.direction_dy)


def _estimate_step_length(obj, theta, cfg):
    """Step-length scale = |F*Fm| / |m| (`cgrad.py:9-24`).

    One pair-safe program: no complex array ever crosses the boundary, and
    only the real scalar is downloaded.
    """
    from tike_tpu.utils.transfer import scalar

    s = scalar(lamino_step_scale(cfg, obj, theta), default=float("nan"))
    # A zero initial object yields 0/0; fall back to unit step like the
    # reference does for the NaN it produces there.
    return s if np.isfinite(s) and s > 0 else 1.0


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

        return scalar(lamino_cost_p(cfg, data, theta, u))

    def grad(u):
        return lamino_grad_p(cfg, data, theta, u)

    obj, cost = tike_tpu.opt.conjugate_gradient(
        None,
        x=obj,
        cost_function=cost_function,
        grad=grad,
        direction_dy=_direction_dy_p,
        num_iter=cg_iter,
        step_length=step_length,
    )
    logger.info("%10s cost is %+12.5e", "object", cost)
    return {"obj": obj, "cost": cost, "step_length": step_length}

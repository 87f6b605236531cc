"""Conjugate-gradient solver for the Bucket laminography operator.

TPU-native equivalent of `/root/reference/src/tike/lamino/solvers/bucket.py`.
The reference's device-group reduction structure (obj_split) collapses into
sharded arrays: sharding the voxel grid over a mesh axis shards the volume,
and XLA reduces the projections.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp

import tike_tpu.linalg
import tike_tpu.opt
from tike_tpu.ops.bucket import (
    BucketConfig,
    bucket_adj,
    bucket_cost,
    bucket_fwd,
    bucket_grad,
)

logger = logging.getLogger(__name__)


def _estimate_step_length(cfg, obj, fwd_data, theta, grid):
    """Step length scale = 2 |F* F m| / |m| (`solvers/bucket.py:9-38`)."""
    from tike_tpu.utils.transfer import scalar
    import numpy as _np

    outnback = bucket_adj(cfg, fwd_data, theta, grid)
    s = scalar(
        2 * tike_tpu.linalg.norm(outnback)
        / (tike_tpu.linalg.norm(obj) + 1e-32),
        default=float("nan"),
    )
    return s if _np.isfinite(s) and s > 0 else 1.0


def bucket(
    cfg: BucketConfig,
    data,
    theta,
    obj,
    grid,
    cg_iter=4,
    step_length=1,
    **kwargs,
):
    """One outer CG iteration for the Bucket laminography problem."""
    nz = obj.shape[0]

    def fwd_op(u):
        return bucket_fwd(cfg, u, theta, grid)

    fwd_data = fwd_op(obj)
    if step_length == 1:
        step_length = _estimate_step_length(cfg, obj, fwd_data, theta, grid)

    def cost_function(u):
        from tike_tpu.utils.transfer import scalar

        return scalar(bucket_cost(data, fwd_op(u)))

    def grad(u):
        return bucket_grad(cfg, data, theta, fwd_op(u), grid).reshape(
            u.shape
        )

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

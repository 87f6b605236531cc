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


def bucket(
    cfg: BucketConfig,
    data,
    theta,
    obj,
    grid,
    cg_iter=4,
    step_length=1,
    fwd_op=None,
    adj_op=None,
    **kwargs,
):
    """One outer CG iteration for the Bucket laminography problem.

    ``fwd_op``/``adj_op`` default to the single-device operators; the
    volume-model-parallel driver injects the shard_map pair from
    ``tike_tpu.ops.bucket.sharded_bucket_ops`` (the reference's obj_split
    path, `lamino/solvers/bucket.py:41-172`).
    """
    nz = obj.shape[0]

    if fwd_op is None:

        def fwd_op(u):
            return bucket_fwd(cfg, u, theta, grid)

    if adj_op is None:

        def adj_op(d):
            return bucket_adj(cfg, d, theta, grid)

    fwd_data = fwd_op(obj)
    if step_length == 1:
        from tike_tpu.utils.transfer import scalar as _scalar
        import numpy as _np

        s = _scalar(
            2
            * tike_tpu.linalg.norm(adj_op(fwd_data))
            / (tike_tpu.linalg.norm(obj) + 1e-32),
            default=float("nan"),
        )
        step_length = s if _np.isfinite(s) and s > 0 else 1.0

    def cost_function(u):
        from tike_tpu.utils.transfer import scalar

        return scalar(bucket_cost(data, fwd_op(u)))

    def grad(u):
        ntheta = data.shape[-3]
        return (
            adj_op(fwd_op(u) - data) / (ntheta * cfg.n**3)
        ).reshape(u.shape)

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

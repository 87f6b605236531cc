"""Conjugate-gradient solver for the Bucket laminography operator.

TPU-native equivalent of `/root/reference/src/tike/lamino/solvers/bucket.py`.
The reference's device-group reduction structure (obj_split) collapses into
sharded arrays: sharding the voxel grid over a mesh axis shards the volume,
and XLA reduces the projections.

All cost/gradient/step-scale evaluations are single pair-safe programs
(`tike_tpu.utils.pairs`): on relay backends no complex array crosses a
program boundary; only real scalars are downloaded between CG steps.
"""

from __future__ import annotations

import logging

import numpy as np

import tike_tpu.opt
from tike_tpu.ops.bucket import (
    BucketConfig,
    bucket_cost_program,
    bucket_grad_program,
    bucket_step_scale,
)
from tike_tpu.utils.pairs import pair_jit

logger = logging.getLogger(__name__)

# Module-level so the jit cache survives across outer CG iterations.
_direction_dy_p = pair_jit(tike_tpu.opt.direction_dy)


def bucket(
    cfg: BucketConfig,
    data,
    theta,
    obj,
    grid,
    cg_iter=4,
    step_length=1,
    cost_op=None,
    grad_op=None,
    step_scale_op=None,
    **kwargs,
):
    """One outer CG iteration for the Bucket laminography problem.

    ``cost_op``/``grad_op``/``step_scale_op`` default to the single-device
    pair-safe programs; the volume-model-parallel driver injects the
    shard_map triple from ``tike_tpu.ops.bucket.sharded_bucket_ops`` (the
    reference's obj_split path, `lamino/solvers/bucket.py:41-172`).
    """
    nz = obj.shape[0]

    if cost_op is None:

        def cost_op(data_, u, theta_):
            return bucket_cost_program(cfg, data_, u, theta_, grid)

    if grad_op is None:

        def grad_op(data_, u, theta_):
            return bucket_grad_program(cfg, data_, u, theta_, grid)

    if step_scale_op is None:

        def step_scale_op(u, theta_):
            return bucket_step_scale(cfg, u, theta_, grid)

    if step_length == 1:
        from tike_tpu.utils.transfer import scalar as _scalar

        s = _scalar(step_scale_op(obj, theta), default=float("nan"))
        step_length = s if np.isfinite(s) and s > 0 else 1.0

    def cost_function(u):
        from tike_tpu.utils.transfer import scalar

        return scalar(cost_op(data, u, theta))

    def grad(u):
        g = grad_op(data, u, theta)
        return _reshape_like(g, obj)

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


def _reshape_like(g, obj):
    """Reshape a (flat or shaped) gradient to obj's shape, Pair-aware."""
    from tike_tpu.utils.pairs import Pair

    if isinstance(g, Pair):
        target = obj.data.shape if isinstance(obj, Pair) else (*obj.shape, 2)
        if g.data.shape != target:
            return Pair(g.data.reshape(target))
        return g
    if g.shape != obj.shape:
        return g.reshape(obj.shape)
    return g

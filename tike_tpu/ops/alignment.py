"""Composite alignment operator: pad -> shift -> flow -> rotate.

TPU-native equivalent of
`/root/reference/src/tike/operators/cupy/alignment.py:15-126`.
"""

from __future__ import annotations

from .flow import flow_adj, flow_fwd
from .pad import pad_adj, pad_fwd
from .rotate import rotate_adj, rotate_fwd
from .shift import shift_adj, shift_fwd


def alignment_fwd(
    unpadded,
    shift,
    flow,
    padded_shape,
    angle,
    unpadded_shape=None,
    cval=0.0,
):
    return rotate_fwd(
        flow_fwd(
            shift_fwd(
                pad_fwd(unpadded, padded_shape=padded_shape, cval=cval),
                shift,
            ),
            flow,
            cval=cval,
        ),
        angle,
        cval=cval,
    )


def alignment_adj(
    rotated,
    flow,
    shift,
    unpadded_shape,
    angle,
    padded_shape=None,
    cval=0.0,
):
    return pad_adj(
        shift_adj(
            flow_adj(
                rotate_adj(rotated, angle, cval=cval),
                flow,
                cval=cval,
            ),
            shift,
        ),
        unpadded_shape=unpadded_shape,
    )


def alignment_inv(
    rotated,
    flow,
    shift,
    unpadded_shape,
    angle,
    padded_shape=None,
    cval=0.0,
):
    from .flow import flow_fwd as _ffwd
    from .rotate import rotate_fwd as _rfwd

    return pad_adj(
        shift_adj(
            _ffwd(
                _rfwd(
                    rotated,
                    None if angle is None else -angle,
                    cval=cval,
                ),
                None if flow is None else -flow,
                cval=cval,
            ),
            shift,
        ),
        unpadded_shape=unpadded_shape,
    )


# Pair-safe program boundaries (tike_tpu.utils.pairs): on relay backends no
# complex array may cross a program boundary, so the driver-facing variants
# run the whole pad->shift->flow->rotate composition as ONE program.
from tike_tpu.utils.pairs import pair_jit as _pair_jit  # noqa: E402

alignment_fwd_p = _pair_jit(
    alignment_fwd, static_argnames=("padded_shape", "unpadded_shape")
)
alignment_adj_p = _pair_jit(
    alignment_adj, static_argnames=("padded_shape", "unpadded_shape")
)
alignment_inv_p = _pair_jit(
    alignment_inv, static_argnames=("padded_shape", "unpadded_shape")
)

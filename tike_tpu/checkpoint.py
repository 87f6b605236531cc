"""Checkpoint save/load for solver state.

The reference's checkpoint is the `PtychoParameters` object itself, kept
device-resident and round-tripped with pickle in tests (SURVEY.md §5,
`tests/ptycho/test_ptycho.py:49-56`). Here the same object is serialized to
a single `.npz` file (portable, no pickle of code objects): arrays plus a
JSON header of options fields. Adam moments, preconditioners, cost/time
history, and the affine position transform all round-trip, so a
reconstruction can resume exactly.
"""

from __future__ import annotations

import dataclasses
import json
import typing

import numpy as np

from .ptycho.exitwave import ExitWaveOptions
from .ptycho.object import ObjectOptions
from .ptycho.position import AffineTransform, PositionOptions
from .ptycho.probe import ProbeOptions
from .ptycho.solvers.options import (
    LstsqOptions,
    PtychoParameters,
    RpieOptions,
)

__all__ = ["save_parameters", "load_parameters"]

_ALGO_TYPES = {"rpie": RpieOptions, "lstsq_grad": LstsqOptions}


def _split_fields(obj, arrays, prefix):
    """Separate array fields (saved to npz) from JSON-able scalars."""
    meta = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if v is None:
            meta[f.name] = None
        elif isinstance(v, AffineTransform):
            meta[f.name] = {"__affine__": list(v.astuple())}
        elif hasattr(v, "shape") and getattr(v, "ndim", 0) > 0:
            key = f"{prefix}.{f.name}"
            arrays[key] = np.asarray(v)
            meta[f.name] = {"__array__": key}
        elif isinstance(v, (list, tuple)):
            try:
                json.dumps(v)
                meta[f.name] = list(v)
            except TypeError:
                arr = np.asarray(v)
                key = f"{prefix}.{f.name}"
                arrays[key] = arr
                meta[f.name] = {"__array__": key, "__aslist__": True}
        elif isinstance(v, (bool, int, str)):
            meta[f.name] = v
        elif isinstance(v, float) or np.isscalar(v):
            meta[f.name] = float(v)
        else:
            meta[f.name] = None
    return meta


def _restore_fields(cls, meta, arrays, construct_args=()):
    init_fields = {
        f.name for f in dataclasses.fields(cls) if f.init
    }

    def decode(v):
        if isinstance(v, dict) and "__array__" in v:
            arr = arrays[v["__array__"]]
            return arr.tolist() if v.get("__aslist__") else arr
        if isinstance(v, dict) and "__affine__" in v:
            return AffineTransform(*v["__affine__"])
        if isinstance(v, list):
            return v
        return v

    kwargs = {
        k: decode(v)
        for k, v in meta.items()
        if k in init_fields and not k.startswith("_")
    }
    obj = cls(**kwargs)
    # Restore non-init fields (momenta, histories, preconditioners).
    for k, v in meta.items():
        if k not in init_fields:
            try:
                setattr(obj, k, decode(v))
            except dataclasses.FrozenInstanceError:
                pass
    return obj


def save_parameters(path: str, parameters: PtychoParameters) -> None:
    """Serialize a (host-side) PtychoParameters to a single .npz file."""
    p = parameters.copy_to_host()
    arrays: typing.Dict[str, np.ndarray] = {
        "probe": np.asarray(p.probe),
        "psi": np.asarray(p.psi),
        "scan": np.asarray(p.scan),
    }
    if p.eigen_probe is not None:
        arrays["eigen_probe"] = np.asarray(p.eigen_probe)
    if p.eigen_weights is not None:
        arrays["eigen_weights"] = np.asarray(p.eigen_weights)

    header = {"algorithm": p.algorithm_options.name}
    header["algorithm_options"] = _split_fields(
        p.algorithm_options, arrays, "algo"
    )
    for name, opts in (
        ("exitwave_options", p.exitwave_options),
        ("probe_options", p.probe_options),
        ("object_options", p.object_options),
        ("position_options", p.position_options),
    ):
        if opts is None:
            header[name] = None
        else:
            header[name] = _split_fields(opts, arrays, name)
            # PositionOptions hides momentum behind a private field.
            if name == "position_options" and opts._momentum is not None:
                arrays["position_options._momentum"] = np.asarray(
                    opts._momentum
                )
                header[name]["_momentum"] = {
                    "__array__": "position_options._momentum"
                }

    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_parameters(path: str) -> PtychoParameters:
    """Load a PtychoParameters checkpoint saved by :func:`save_parameters`."""
    with np.load(path, allow_pickle=False) as f:
        arrays = {k: f[k] for k in f.files}
    header = json.loads(bytes(arrays.pop("__header__")).decode())

    algo_cls = _ALGO_TYPES[header["algorithm"]]
    algorithm_options = _restore_fields(
        algo_cls, header["algorithm_options"], arrays
    )

    def restore(name, cls):
        meta = header[name]
        return None if meta is None else _restore_fields(cls, meta, arrays)

    params = PtychoParameters(
        probe=arrays["probe"],
        psi=arrays["psi"],
        scan=arrays["scan"],
        eigen_probe=arrays.get("eigen_probe"),
        eigen_weights=arrays.get("eigen_weights"),
        algorithm_options=algorithm_options,
        exitwave_options=restore("exitwave_options", ExitWaveOptions),
        probe_options=restore("probe_options", ProbeOptions),
        object_options=restore("object_options", ObjectOptions),
        position_options=restore("position_options", PositionOptions),
    )
    return params

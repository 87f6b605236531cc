"""Ptychography solvers and the parameter model."""

from .options import (
    IterativeOptions,
    LstsqOptions,
    PtychoParameters,
    RpieOptions,
    crop_fourier_space,
    pad_fourier_space,
)
from ._preconditioner import update_preconditioners
from .lstsq import lstsq_grad
from .rpie import rpie

__all__ = [
    "crop_fourier_space",
    "pad_fourier_space",
    "lstsq_grad",
    "LstsqOptions",
    "PtychoParameters",
    "rpie",
    "RpieOptions",
    "update_preconditioners",
]

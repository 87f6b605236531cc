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
from .rpie import rpie

__all__ = [
    "crop_fourier_space",
    "pad_fourier_space",
    "LstsqOptions",
    "PtychoParameters",
    "rpie",
    "RpieOptions",
    "update_preconditioners",
]

"""Alignment: rigid and non-rigid image registration."""

from .align import reconstruct, simulate, invert
from . import solvers

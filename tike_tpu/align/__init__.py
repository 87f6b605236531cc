"""Alignment: rigid and non-rigid image registration."""

from .align import reconstruct, simulate, invert
from .solvers.cross_correlation import cross_correlation
from .solvers.farneback import farneback
from . import solvers

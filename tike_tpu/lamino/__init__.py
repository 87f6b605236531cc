"""Laminography: recover a 3D complex volume from tilted projections."""

from .lamino import reconstruct, simulate
from .solvers.cgrad import cgrad
from . import bucket
from . import solvers

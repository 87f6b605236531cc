"""Laminography solvers."""

from .bucket import bucket
from .cgrad import cgrad

__all__ = ["bucket", "cgrad"]

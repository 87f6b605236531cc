"""Laminography solvers."""

from .cgrad import cgrad

__all__ = ["cgrad"]

"""Ptychography: solvers, parameter model, probe/object/position tooling.

Public API mirrors the reference `tike.ptycho` package.
"""

from .exitwave import *  # noqa: F401,F403
from .fresnel import *  # noqa: F401,F403
from .object import *  # noqa: F401,F403
from .position import *  # noqa: F401,F403
from .probe import *  # noqa: F401,F403
from .ptycho import *  # noqa: F401,F403
from .solvers import *  # noqa: F401,F403

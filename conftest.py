"""Root test configuration: opportunistic parallel test execution.

On multi-core machines the suite runs under pytest-xdist (`-n auto`) so the
default wall time stays under the 5-minute budget; on single-core boxes or
when xdist is unavailable this is a no-op. Explicit `-n`/`--dist` arguments
always win.
"""

import os


def pytest_load_initial_conftests(early_config, parser, args):
    if any(a == "-n" or a.startswith("-n") or a == "--dist" for a in args):
        return
    cpus = os.cpu_count() or 1
    if cpus < 2:
        return
    try:
        import xdist  # noqa: F401
    except ImportError:
        return
    args[:] = ["-n", "auto"] + args

"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices, mirroring how the reference tests
multi-node with 2 MPI ranks on one box (SURVEY.md §4).
"""

import os

# Force CPU: the ambient environment may point JAX at a tunneled TPU chip,
# which is reserved for bench.py. Override with TIKE_TEST_PLATFORM if needed.
# jax may already be imported by sitecustomize, so set the config directly
# in addition to the env var.
_platform = os.environ.get("TIKE_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_num_cpu_devices", 8)

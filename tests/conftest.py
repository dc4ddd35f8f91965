"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count), as the reference offers no
distributed-test pattern to follow (SURVEY.md section 4) and only one
real TPU chip is attached in CI.

NOTE: this container preimports jax at interpreter startup (axon TPU
plugin sitecustomize), so JAX_PLATFORMS set here would be read too late.
jax.config.update works as long as no backend has been initialized yet.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test harness config.

All tests run on the CPU backend with 8 fake devices so every mesh/sharding
code path is exercised without TPU hardware (SURVEY.md §4
"distributed-without-cluster"). Must set flags before jax initializes.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test harness config.

All tests run on the CPU backend with 8 fake devices so every mesh/sharding
code path is exercised without TPU hardware (SURVEY.md §4
"distributed-without-cluster"). A pytest plugin imports jax before this
conftest runs, so plain env vars are too late — use jax.config, which works
any time before backend initialization.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

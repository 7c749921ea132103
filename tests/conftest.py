"""Test config: 8 virtual CPU devices (multi-chip sharding tests) + f64.

Mirrors the reference's testing approach of running `mpirun -np N` on one
machine (ref: cmake/functions/four_c_testing_functions.cmake:119-151):
partition-invariance is checked on a virtual 8-device CPU mesh.

Note: this environment pre-registers a remote TPU ("axon") backend via
sitecustomize before pytest starts; jax.config.update after import is the
reliable way to pin the CPU platform for tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on simulated devices (the real environment
has a single TPU chip); see SURVEY.md §4 for the test strategy.
"""

import os

# hard-override: the environment profile sets JAX_PLATFORMS=axon (TPU tunnel)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# the persistent compilation cache may hold AOT results compiled with
# different CPU feature flags (SIGILL risk) — tests always compile fresh
os.environ["COSY_TPU_NO_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

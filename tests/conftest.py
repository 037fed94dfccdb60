"""Test harness: force CPU with 8 virtual devices so pjit/sharding tests run
hermetically (SURVEY.md §4 implication (d))."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon site hook (sitecustomize) force-selects the TPU backend via
# jax.config at import time, overriding JAX_PLATFORMS; undo it for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


"""Test configuration.

Force JAX onto a virtual 8-device CPU mesh so sharding/collective logic is
testable without a TPU pod (SURVEY.md §4: multi-node test strategy).  Must
run before any jax import.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin force-prepends itself to jax_platforms, overriding the
# JAX_PLATFORMS env var — a config update is the only reliable CPU pin.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

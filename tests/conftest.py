"""Test configuration: run the whole suite on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The hosting environment force-registers an experimental TPU platform
# ("axon") that overrides JAX_PLATFORMS; pin CPU explicitly so the test
# suite always runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

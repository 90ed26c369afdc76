import os

# Force the CPU backend with a virtual 8-device mesh so multi-chip sharding
# paths are exercised without TPU hardware (SURVEY.md §4).
# Note: the axon TPU plugin in this environment force-registers itself ahead
# of the JAX_PLATFORMS env var, so we must pin the platform via jax.config
# before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

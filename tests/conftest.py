"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run anywhere (the axon TPU plugin ignores JAX_PLATFORMS,
so we use jax.config before backend init)."""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

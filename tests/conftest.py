"""Test config: force CPU backend with 8 virtual devices for sharding tests.

The ambient environment may pin JAX_PLATFORMS to a TPU platform plugin that
ignores the env var set this late; use jax.config.update as well, which
takes effect as long as no backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

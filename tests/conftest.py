"""Test harness: force an 8-device host-CPU farm before any test imports JAX.

Multi-chip sharding is validated the JAX-native way — virtual CPU devices via
``xla_force_host_platform_device_count`` — because CI has no TPU pod.

Note: the environment's sitecustomize registers the axon TPU plugin and
pins ``jax_platforms=axon,cpu`` itself, so setting JAX_PLATFORMS here is not
enough — we must override via jax.config after import, before backends
initialise.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

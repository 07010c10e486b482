"""Test harness: force an 8-device host-CPU farm before JAX initialises.

Multi-chip sharding is validated the JAX-native way — virtual CPU devices via
``xla_force_host_platform_device_count`` — because CI has no TPU pod.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

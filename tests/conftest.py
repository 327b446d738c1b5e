"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens via bench.py; tests validate math and sharding
on host CPU so they run anywhere (and exercise multi-chip code paths via
jax.sharding over the virtual devices).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

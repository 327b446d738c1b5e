"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens via bench.py; tests validate math and sharding
on host CPU so they run anywhere (and exercise multi-chip code paths via
jax.sharding over the virtual devices).

The environment's sitecustomize imports jax at interpreter start and points
it at a remote TPU tunnel (JAX_PLATFORMS=axon), so setting the env var here
is too late — update the already-imported config instead (backends are not
initialized until first use, so this is still in time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

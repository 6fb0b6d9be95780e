"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-host logic is tested without a cluster via
``xla_force_host_platform_device_count`` (SURVEY.md §4 item 4). Must set the
env vars before jax is imported anywhere.
"""

import os

# Override (not setdefault): the session env pins JAX_PLATFORMS=axon (the
# tunneled TPU), which is slow and single-chip; unit tests use the 8-device
# virtual CPU mesh. TPU-hardware runs go through bench.py instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

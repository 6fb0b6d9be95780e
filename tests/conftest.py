"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-host logic is tested without a cluster via
``xla_force_host_platform_device_count`` (SURVEY.md §4 item 4).

The session environment force-registers the tunneled single-chip TPU backend
("axon") from sitecustomize and pins JAX_PLATFORMS, so plain env vars are not
enough — we override platform selection through jax.config before any backend
is initialized. TPU-hardware runs go through bench.py instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

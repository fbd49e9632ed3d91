"""Test environment: force JAX onto CPU with 8 virtual devices so sharding
tests run anywhere, and keep x64 available for oracle comparisons."""

import os

# Hard override: the dev environment pins JAX onto the real TPU (axon) via a
# PYTHONPATH site hook; unit tests must run hermetically on the host with a
# virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

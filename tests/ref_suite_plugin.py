"""Pytest plugin that lets the REFERENCE's own test files run against this
library: forces the hermetic CPU backend and installs the ``skrample``
compat aliases before the reference tests import anything."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from skrample_tpu import compat  # noqa: E402

compat.install()

"""Test env: force CPU with 8 virtual devices so mesh/pjit paths are
exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402  (import after env so the flag takes effect)

jax.config.update("jax_default_matmul_precision", "highest")

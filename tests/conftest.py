"""Test env: force CPU with 8 virtual devices so mesh/pjit paths are
exercised without TPU hardware (SURVEY.md §4).

Note: this environment pre-imports jax at interpreter startup (the TPU
platform plugin registers via sitecustomize), so JAX_PLATFORMS set here via
os.environ would be ignored — use jax.config.update, which takes effect any
time before the backend is first initialized.
"""

import os

os.environ.setdefault("FUDANOCR_TENSORBOARD", "0")  # skip ~20 s TF import

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# NOTE (suite-time experiments, round 3): lowering the XLA:CPU LLVM opt
# level (--xla_backend_optimization_level=0 and/or
# --xla_llvm_disable_expensive_passes=true) cuts compile-bound tests 30-50%
# (det-guided gt smoke 207->108 s) but devectorizes the generated loops, so
# runtime-bound smokes explode (oictr app smoke 150->595 s). Net suite time
# is unchanged; XLA_FLAGS is process-global so it cannot be set per test.
# Keep default codegen.

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()} — was the backend "
    "initialized before conftest ran?")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules. The full suite
    otherwise accumulates ~7 GB RSS of jit caches, and under memory/load
    pressure the CPU client has (rarely, non-deterministically) died with
    SIGABRT mid-trace; per-module clearing bounds the growth at no
    meaningful runtime cost (jits are module-local)."""
    yield
    jax.clear_caches()

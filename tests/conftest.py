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
    flags += " --xla_force_host_platform_device_count=8"
# Suite time (round 3): the tests are LLVM-compile-bound on the 1-core CI
# host, so lower the XLA:CPU backend opt level. Level 0 halves the
# compile-bound tests but devectorizes loops (runtime-bound tests pay
# ~2x: sr smoke 104->190 s, oictr full-width port parity 50->101 s);
# level 1 keeps ~80% of the compile win while restoring baseline runtimes
# (A/B on the three shape-defining tests: det-guided gt smoke
# 207->140->153 s, sr smoke 104->190->89 s, oictr parity 50->101->40 s
# for default->L0->L1). Full suite: 35 min default, 24 min L0, ~20 min L1.
# Numerics are unaffected (same HLO math, only LLVM scheduling/
# vectorization change); every port-parity tolerance holds at all levels.
if "backend_optimization_level" not in flags:
    flags += (" --xla_backend_optimization_level=1"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags

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

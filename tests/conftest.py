"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# Few-core hosts starve CPU-mesh collective rendezvous past the default
# 40 s termination limit (see __graft_entry__.py); raise it for the tests.
for f in (
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=300",
    "--xla_cpu_collective_call_terminate_timeout_seconds=1800",
    # XLA CPU splits LLVM codegen across a thread pool per compile; with
    # the hundreds of compiles this suite issues in one process that path
    # segfaults/aborts nondeterministically on this host (observed inside
    # backend_compile_and_load at different tests across runs, while any
    # single file passes in isolation). Serializing codegen removes the
    # crash at a small compile-time cost.
    "--xla_cpu_parallel_codegen_split_count=1",
):
    if f.split("=")[0] not in flags:
        flags += " " + f
os.environ["XLA_FLAGS"] = flags.strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA's default matmul precision truncates to bf16-like accuracy; parity
# tests need exact f32 contractions. NOTE: the JAX_PLATFORMS env var is not
# honored in this environment (the axon TPU plugin wins), so the platform
# must be forced programmatically before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_xla_executables_between_modules():
    """Free compiled XLA executables after every test module.

    The suite compiles hundreds of CPU executables in one process; letting
    them accumulate crashes XLA's CPU compiler late in the run (observed
    repeatedly on this 2-core host as SIGSEGV/SIGABRT inside
    backend_compile_and_load — in the big test_tp sharded-step compile or
    the engine warmup-thread compiles — while any single file passes in
    isolation). Dropping the pjit/executable caches between modules keeps
    the live-executable footprint at single-module scale; modules re-jit
    their own graphs anyway, so the only cost is losing cross-module cache
    hits (which are rare — modules use different shapes/configs).
    """
    yield
    jax.clear_caches()
    gc.collect()

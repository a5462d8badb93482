"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA's default matmul precision truncates to bf16-like accuracy; parity
# tests need exact f32 contractions. NOTE: the JAX_PLATFORMS env var is not
# honored in this environment (the axon TPU plugin wins), so the platform
# must be forced programmatically before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

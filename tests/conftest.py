"""Force a deterministic 8-device CPU mesh for all tests (no TPU needed).

jax is pre-imported by the interpreter in this image, so env vars alone are
ignored; use config.update before any backend initialization instead.
"""
import os

import jax

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

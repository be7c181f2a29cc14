"""Test environment: force an 8-device virtual CPU mesh before any test
imports jax.

Multi-chip hardware isn't available in CI; sharding tests run against 8
virtual CPU devices as recommended for SPMD testing. Note the environment may
pre-register a TPU PJRT plugin through sitecustomize and programmatically
override ``jax_platforms``, so env vars alone are not enough — we update the
jax config directly after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: repeated test runs skip XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

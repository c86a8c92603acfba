"""Test configuration: force the CPU platform (with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware).

NOTE: this environment's sitecustomize registers an 'axon' TPU backend and pins
JAX_PLATFORMS=axon before pytest starts, so mutating os.environ here is too late for
the platform choice; jax.config.update("jax_platforms", ...) still works because the
backends are not initialized yet. The device-count flag must still go through
XLA_FLAGS before backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_qpympc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu"

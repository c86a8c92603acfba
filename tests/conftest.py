"""Test configuration: force an 8-device virtual CPU platform so multi-chip sharding
paths are exercised without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_qpympc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

"""Test configuration.

Some installed package registers a pytest plugin that imports jax BEFORE
conftest executes, so environment variables alone are too late. We use
jax.config.update, which works as long as no backend has been initialized
yet (plugins only import jax, they don't run computations).

The sandbox's default JAX_PLATFORMS=axon points at a remote TPU tunnel with
remote compilation — tests must run on local CPU for exact fp32 numerics
and local compiles. Multi-chip sharding tests live in tests/multichip/ /
test_multichip_launcher.py and run in a subprocess: the
--xla_force_host_platform_device_count flag slows every XLA:CPU compile
~16x on this 1-core sandbox and must not leak into this process.
"""

import os

# env for any subprocesses we spawn
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

collect_ignore_glob = ["multichip/*"]

"""Test config: force CPU with 8 virtual devices so sharding/pjit paths are
exercised without TPU hardware (SURVEY.md §4 test-strategy note)."""

import os
import sys

# NOTE: the sandbox presets JAX_PLATFORMS=axon (the tunneled TPU) and a
# sitecustomize imports jax at interpreter start, latching that default.
# Overwriting the env var alone is NOT enough — update the live jax config
# too (backends are still uninitialized when conftest runs).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Persistent XLA compile cache for the suite (r5): test shapes/configs are
# deterministic, so every rerun after the first hits the cache and the fast
# tier drops from ~25 min of 1-core XLA compiles to a few minutes. The
# cache dir is per-machine state, NOT committed (.gitignore).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

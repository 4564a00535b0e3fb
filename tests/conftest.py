"""Test config: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md §4).

Note: this environment force-registers an 'axon' TPU platform via
jax_platforms config (overriding the JAX_PLATFORMS env var), so we override
the config directly after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# XLA compiles are slow in this environment (~1.2s even for trivial ops);
# cache them persistently so repeat test runs are fast.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

"""Platform selection for CLIs.

This image force-registers a remote 'axon' TPU platform through jax's
config, which overrides the JAX_PLATFORMS env var. `setup_platform()`
re-applies the user's choice (HUMOR_PLATFORM=cpu|tpu) through the config
API, which does win. CLIs call it before importing anything that
initializes jax backends.
"""

from __future__ import annotations

import os


def setup_platform(default: str = "") -> None:
    plat = os.environ.get("HUMOR_PLATFORM", default)
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)
    if plat == "cpu" and "xla_force_host_platform_device_count" not in \
            os.environ.get("XLA_FLAGS", ""):
        # keep the virtual multi-device mesh available for sharding paths
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8").strip()

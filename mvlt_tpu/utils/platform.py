"""Platform-selection plumbing shared by the CLI drivers.

sitecustomize may register a TPU platform plugin before env vars are
read, latching the platform choice; a child process spawned with
JAX_PLATFORMS=cpu (tests, CI) would otherwise still dial the TPU and
hang when it is unreachable (mirrors tests/conftest.py).
"""

import os


def honor_jax_platforms() -> None:
    """Apply the JAX_PLATFORMS env var at the jax-config level, before
    first device use."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

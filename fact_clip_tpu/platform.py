"""JAX platform selection helper.

The deployment container's sitecustomize registers the ``axon`` TPU backend
and pins ``JAX_PLATFORMS=axon`` before user code runs; the env var alone does
not switch backends afterwards, but ``jax.config`` does.  Entry points call
``ensure_platform()`` so ``JAX_PLATFORMS=cpu python scripts/train.py ...``
behaves as expected everywhere.
"""

from __future__ import annotations

import os


def ensure_platform(platform: str | None = None) -> str:
    import jax

    p = platform or os.environ.get("JAX_PLATFORMS")
    if p:
        try:
            jax.config.update("jax_platforms", p)
        except Exception:
            pass
    return jax.default_backend()

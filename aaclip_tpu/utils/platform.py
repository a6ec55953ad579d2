"""Platform-selection shim for CLIs and tools.

The axon TPU plugin wins JAX's platform selection even when
``JAX_PLATFORMS=cpu`` is set in the environment; the config flag must also
be set before the backend initializes (CLAUDE.md).  Every CLI entry point
calls :func:`honor_env_platform` first so
``JAX_PLATFORMS=cpu python tools/predict_folder.py ...`` behaves as
documented.
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    """Mirror the ``JAX_PLATFORMS`` env var into jax's config flag.

    No-op when the var is unset or the backend is already initialized with
    the requested platform.  Must run before the first call that touches
    ``jax.devices()``.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        pass  # backend already initialized; env selection already applied

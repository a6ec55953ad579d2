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
        # backend already initialized (some import touched jax.devices()
        # before this shim ran).  That is NOT harmless here: the axon
        # plugin wins selection over the env var, so the run may be on
        # TPU despite JAX_PLATFORMS=cpu — say so instead of silence.
        try:
            actual = jax.devices()[0].platform
        except Exception:
            actual = "unknown"
        if actual != plat.split(",")[0]:
            import logging
            logging.getLogger("aaclip").warning(
                "JAX_PLATFORMS=%s requested but the %s backend is already "
                "initialized — call honor_env_platform() before anything "
                "that touches jax.devices()", plat, actual)

"""Persistent XLA compilation cache.

Remote TPU compiles of the ViT-L towers take tens of seconds; enabling
JAX's on-disk compilation cache makes every CLI/bench invocation after the
first start instantly.  Call early, before the first jit execution.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    path = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/aaclip_tpu/xla"))
    os.makedirs(path, exist_ok=True)
    # attempt each flag independently and WARN on failure: one blanket
    # except would silently disable the cache and every invocation then
    # pays the tens-of-seconds remote recompile this module exists to
    # avoid (the first flag is the essential one; the tuning flags are
    # best-effort)
    for flag, value in (
        ("jax_compilation_cache_dir", path),
        ("jax_persistent_cache_min_compile_time_secs", 1.0),
        ("jax_persistent_cache_min_entry_size_bytes", 0),
    ):
        try:
            jax.config.update(flag, value)
        except Exception as e:  # older jax without this flag
            import logging
            logging.getLogger("aaclip").warning(
                "compile cache: could not set %s (%s)", flag, e)

"""Small shared utilities."""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("slim_tpu")

_cache_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    The solver kernels cost minutes to compile on remote-compile TPU
    setups; the cache drops warm-process startup to seconds.  Set
    SLIM_TPU_NO_CACHE=1 to disable.
    """
    global _cache_enabled
    if _cache_enabled or os.environ.get("SLIM_TPU_NO_CACHE") == "1":
        return
    try:
        import jax

        cache_dir = path or os.environ.get(
            "SLIM_TPU_CACHE_DIR",
            os.path.expanduser("~/.cache/slim_tpu_jax"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _cache_enabled = True
    except Exception as e:  # pragma: no cover
        logger.debug("compilation cache unavailable: %s", e)

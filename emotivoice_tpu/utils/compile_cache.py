"""Persistent XLA compilation cache helper.

First compiles are expensive (tens of seconds on-chip; minutes through a
remote TPU transport) and serving/training should not pay them on every
process start. JAX's persistent cache keys on program + compiler version +
platform, so enabling it is safe across restarts on the same machine.
"""

from __future__ import annotations

import os


def enable_persistent_cache(directory: str | None = None) -> str:
    """Turn on jax's on-disk compilation cache (idempotent). Returns the
    cache dir. Default: $EMOTIVOICE_JAX_CACHE or ~/.cache/emotivoice_tpu/jax.
    """
    import jax

    directory = (
        directory
        or os.environ.get("EMOTIVOICE_JAX_CACHE")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "emotivoice_tpu", "jax"
        )
    )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return directory

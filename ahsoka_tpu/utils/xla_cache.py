"""Persistent XLA compilation cache.

The reference has no compilation step; here every device kernel is an XLA
program whose first compile can take seconds (tens of seconds on remote
TPU backends).  Enabling jax's persistent compilation cache makes repeat
pipeline runs skip those compiles entirely (verified: the containment
kernel writes/reads a cache entry on the axon TPU backend).

Cache dir: $AHSOKA_XLA_CACHE if set (``0``/``off`` disables), else
``~/.cache/ahsoka_tpu/xla``.  Failures are non-fatal — the cache is a
pure optimization.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_compilation_cache() -> bool:
    """Idempotently point jax at the on-disk compilation cache."""
    global _enabled
    if _enabled:
        return True
    env = os.environ.get("AHSOKA_XLA_CACHE", "")
    if env.lower() in ("0", "off", "false", "none"):
        return False
    cache_dir = env or os.path.join(
        os.path.expanduser("~"), ".cache", "ahsoka_tpu", "xla")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        _enabled = True
        return True
    except Exception:
        return False

"""Persistent XLA compile cache shared by every entry point.

The flagship 4-step 512x512 program is a multi-minute compile on this
host.  /tmp does not survive across sessions, so the cache lives inside
the repo tree (gitignored) unless overridden with VIDEOSD_CACHE_DIR.
"""

from __future__ import annotations

import os
import pathlib

import jax

_DEFAULT = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"


def setup(min_compile_time_secs: int = 5) -> str:
    """Point JAX's persistent compilation cache at a durable directory.

    Falls back to a tmp-dir cache when the repo-adjacent default is not
    writable (pip-installed package in a read-only site-packages)."""
    import tempfile

    cache_dir = os.environ.get("VIDEOSD_CACHE_DIR", str(_DEFAULT))
    try:
        pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    except OSError:
        cache_dir = os.path.join(tempfile.gettempdir(), "videosd_jax_cache")
        pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    return cache_dir

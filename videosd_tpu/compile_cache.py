"""Persistent XLA compile cache shared by every entry point.

The flagship 4-step 512x512 program is a multi-minute compile on this
host.  /tmp does not survive across sessions, so the cache lives inside
the repo tree (gitignored) unless overridden with VIDEOSD_CACHE_DIR.

The directory is keyed by backend + host machine signature: XLA:CPU
emits AOT artifacts whose target features are baked in at compile time,
and loading them on a host with different CPU features fails with
``cpu_aot_loader`` errors and a full recompile (observed in
MULTICHIP_r03: a cache written on an AMX-class builder poisoned the
driver rig).  TPU artifacts are serialized HLO and stay portable, so
the TPU subdir is keyed by backend alone.

Residual (upstream XLA, round-4 measurement): XLA:CPU bakes tuning
pseudo-features (``+prefer-no-gather``/``+prefer-no-scatter``) into some
AOT artifacts that host feature detection never reports, so those
entries fail to load EVEN ON THE HOST THAT WROTE THEM and recompile —
noisy ``cpu_aot_loader`` stderr, correct results.  The rest of the cache
still hits (same-process-count rerun of the PP verify: 76 s cold ->
40 s warm), so the cache stays on for CPU.
"""

from __future__ import annotations

import hashlib
import os
import pathlib

import jax

_DEFAULT = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"


def _host_signature() -> str:
    """Stable short hash of the CPU features XLA:CPU compiles against."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def setup(min_compile_time_secs: int = 5) -> str:
    """Point JAX's persistent compilation cache at a durable directory.

    Falls back to a tmp-dir cache when the repo-adjacent default is not
    writable (pip-installed package in a read-only site-packages)."""
    import tempfile

    backend = jax.default_backend()
    sub = f"{backend}-{_host_signature()}" if backend == "cpu" else backend
    root = os.environ.get("VIDEOSD_CACHE_DIR", str(_DEFAULT))
    cache_dir = os.path.join(root, sub)
    try:
        pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    except OSError:
        cache_dir = os.path.join(tempfile.gettempdir(), "videosd_jax_cache", sub)
        pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    return cache_dir

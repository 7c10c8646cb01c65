"""Persistent XLA compilation cache.

First compiles of the full train step take minutes through the TPU relay;
caching compiled executables on disk makes every subsequent process start
fast. Called by the CLIs, bench.py and __graft_entry__.py.
"""

from __future__ import annotations

import os


def cpu_cache_dir() -> str:
    """Per-machine CPU cache dir.

    XLA:CPU caches AOT-compiled executables keyed only by the HLO, so a cache
    shared across machines can serve code compiled for a different CPU's
    feature set (SIGILL risk). Tag the dir with a hash of the host's cpuinfo
    flags so each machine gets its own artifacts.
    """
    import hashlib

    tag = "unknown"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.sha1(line.encode()).hexdigest()[:8]
                    break
    except OSError:
        pass
    return os.path.expanduser(f"~/.cache/favae_tpu_xla_cpu_{tag}")


def enable_persistent_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get(
        "FAVAE_XLA_CACHE", os.path.expanduser("~/.cache/favae_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the flags

"""Persistent XLA compilation cache.

Round-2 measurement: the adaptive-pool size ladder multiplies program
count, pushing bench compile+warmup from 56 s (round 1) to 444 s. A
persistent on-disk cache makes every program after the first run a disk
hit (compile cost is paid once per code+shape change, not per process).
The reference has no analogue (nvcc compiles ahead of time); on a
JIT-everything stack this is part of the build system (SURVEY.md C19).

Entry points (bench.py, tpt.cli, tests/conftest, __graft_entry__) call
enable_persistent_cache() before building any jitted program. Opt out
with TPT_NO_CACHE=1 (e.g. for compile-time measurements).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "tpt_xla")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's compilation cache at a persistent directory. Returns the
    cache dir, or None when disabled via TPT_NO_CACHE=1 or off-TPU (the
    XLA:CPU AOT loader warns about machine-feature mismatches and saves
    little — CPU compiles are seconds; TPU ones are minutes)."""
    if os.environ.get("TPT_NO_CACHE") == "1":
        return None
    import jax

    if jax.default_backend() != "tpu" and not os.environ.get("TPT_CACHE_DIR"):
        return None
    cache_dir = path or os.environ.get("TPT_CACHE_DIR") or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default threshold (1 s) would skip the many mid-size ladder variants;
    # cache everything that takes any measurable compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir

"""Shared CLI setup: persistent XLA compilation cache.

Remote-tunnel TPU compiles cost 50-300 s per jit variant (PERF_NOTES.md);
the persistent cache makes every CLI relaunch with unchanged shapes (play,
resume, BBC->TSC handoff) load compiled binaries instead.  Called at the
top of every entry-point main().
"""
from __future__ import annotations

import os


def enable_compile_cache(path: str = "~/.jax_cache") -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

"""Persistent XLA compilation cache.

First-jit of the big compiled graphs (chunk build, fused align) costs
minutes through a remote-compile link and ~10-40 s locally; the
persistent cache makes every subsequent process reuse them.  The
reference has no compile stage at all, so amortising ours to zero is
required for run-to-run parity (its index LOAD analog is page cache).
Call once before the first jit; honours BIOKANGA_TPU_JAXCACHE (set to
"0"/"off" to disable, or to a directory path to relocate).
"""
from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/biokanga_tpu_xla")


def enable_persistent_cache() -> str | None:
    env = os.environ.get("BIOKANGA_TPU_JAXCACHE", "")
    if env.lower() in ("0", "off", "none"):
        return None
    path = env or _DEFAULT
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path

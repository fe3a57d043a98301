"""Persistent XLA compilation cache.

The full dual-model program takes ~60 s to compile per process (the axon
remote compile helper adds latency on top of XLA itself); caching the
executables on disk drops warm restarts of the CLI/server to seconds.  The
reference has no equivalent (torch CPU has no compile step) — this is
TPU-framework plumbing, enabled by every CLI entry point.
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = Path.home() / ".cache" / "braintpu" / "xla"


def enable_compilation_cache(cache_dir=None) -> str:
    """Point JAX at a persistent compilation cache (idempotent).

    Respects an explicit ``JAX_COMPILATION_CACHE_DIR``; otherwise uses
    ``~/.cache/braintpu/xla``.  Returns the directory in use.
    """
    import jax

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    target = str(cache_dir or env or _DEFAULT_DIR)
    Path(target).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", target)
        # cache everything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without these knobs
        pass
    return target

"""Persistent XLA compilation cache wiring.

First compiles on TPU cost seconds to minutes (and much more through a
remote-compile relay); JAX's persistent cache stores serialized
executables keyed by (module, jaxlib, flags) so warm restarts —
server reboots, repeated bench runs, CLI invocations — skip straight
to execution. The reference has no analogue (its FAISS/torch stack has
no compile step); for a jit-compiled serving stack this is part of the
cold-start story alongside the /health warmup.

Opt-in via ``LEGAL_RAG_COMPILE_CACHE_DIR`` (the CLI honors it for
every subcommand) or programmatically with :func:`enable_compile_cache`
(bench.py points it at its .bench_cache so driver re-runs amortize).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_ENV = "LEGAL_RAG_COMPILE_CACHE_DIR"


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache at ``path`` (or the
    ``LEGAL_RAG_COMPILE_CACHE_DIR`` env var). No-op when neither is
    set. Returns the active directory. Call BEFORE the first jit
    compilation; safe to call more than once."""
    target = path or os.environ.get(_ENV)
    if not target:
        return None
    target = str(Path(target).expanduser())
    Path(target).mkdir(parents=True, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", target)
    # cache even fast compiles: the population cost is one small file
    # write, and serving buckets are worth restoring regardless of how
    # long their first compile took
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return target

"""Platform adaptations for the axon TPU relay.

The relay compiles remotely; on a degraded transport a big program's
first compile can take tens of minutes (BENCH.md "Measurement validity").
JAX's persistent compilation cache works through the relay (verified r5:
second-process compile of the same program drops to sub-second), so every
entry point opts in - one slow compile per unique program per machine,
not per process.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_compile_cache(path: str | None = None) -> str:
    """Point jax at an on-disk compilation cache (idempotent; call before
    the first compile).  Honors JAX_COMPILATION_CACHE_DIR if already set."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took real compile time (default threshold 1 s
    # misses mid-size programs whose relay cost is transport, not compile)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path

"""Persistent XLA compilation cache.

Cold compiles of the full train/eval programs take minutes on this
class of host; the persistent cache brings warm starts down to
seconds.  Called by every entry point (CLIs, bench, graft entry) —
library imports stay side-effect free.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path``.

    Resolution order: explicit arg → ``$RVOS_JAX_CACHE`` → a
    ``.jax_cache/`` directory next to the package.  Returns the path.
    """
    import jax

    path = path or os.environ.get("RVOS_JAX_CACHE") or _DEFAULT
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path

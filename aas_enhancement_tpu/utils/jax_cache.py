"""Persistent XLA compilation cache.

First compile of the fused train step is expensive (minutes through the remote-compile
tunnel); the persistent cache makes every later process start warm.  Call early in
any entry point.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.expanduser("~/.cache/aas_tpu_xla")


def enable(path: str | None = None) -> None:
    path = path or os.environ.get("AAS_XLA_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

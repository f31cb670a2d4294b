"""Persistent XLA compilation cache.

Remote/tunneled TPU deployments can take minutes per XLA compile; the persistent
cache makes every program a one-time cost. Enabled by bench.py, the apps, and the
driver entry points."""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache_tpu")


def enable_persistent_cache(path: str = None) -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

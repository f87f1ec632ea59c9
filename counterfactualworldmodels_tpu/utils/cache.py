"""Persistent XLA compilation cache.

TPU compiles of the fused counterfactual graph take minutes through the
remote-compile tunnel; caching them on disk makes every process after the
first start instantly. Call :func:`enable_persistent_cache` before the first
jit execution (bench.py and the demo wrappers do).
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get('CWM_TPU_CACHE_DIR',
                                   '/root/.cache/cwm_tpu_xla')


def enable_persistent_cache(cache_dir: str = DEFAULT_CACHE_DIR,
                            min_compile_secs: float = 1.0) -> None:
    import jax
    try:
        # inside the try: an unwritable cache dir must degrade to
        # no-caching, not crash the caller (the bench relies on always
        # emitting its JSON line)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          min_compile_secs)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:
        pass  # older jax without these flags

"""Persistent XLA compilation cache.

The flagship train step and the warmup occupancy sweep take minutes to
compile on TPU (the sweep alone measured 265 s); the compiled
executables are deterministic functions of the HLO, so caching them on
disk makes every run after the first start in seconds. The reference
framework has no analog (CUDA kernels are precompiled); this is the
TPU-native equivalent of shipping compiled kernels.

Enabled automatically by NeRFSystem and the CLIs. Opt out with
INGP_COMPILE_CACHE=0 or point INGP_COMPILE_CACHE_DIR somewhere else.
"""
from __future__ import annotations

import os

_done = False


def enable_compile_cache() -> None:
    global _done
    if _done or os.environ.get("INGP_COMPILE_CACHE", "1") != "1":
        return
    _done = True
    import jax

    path = os.environ.get(
        "INGP_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ingp_tpu",
                     "xla_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every compilation that takes noticeable time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only FS: compilation still works

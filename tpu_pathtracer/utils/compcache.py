"""Persistent XLA compilation cache for the CLI tools.

The first jit compile of a render program travels to the remote TPU
compiler and takes minutes for the full integrator (measured 194-262 s
cold for a 256^2 render program on a loaded host). JAX's persistent
compilation cache stores the compiled executable on disk keyed by HLO +
compile options, so a SECOND process that builds the same program skips
the client-side compile entirely — measured 109.8 s vs the 193.9 s
no-cache control on the same machine (the remainder is remote-side
loading the cache cannot skip). The reference app pays its (much
smaller) CUDA compile at build time instead (`src/main.cpp` links
precompiled kernels); this is the TPU analog of shipping binaries.

Call `enable(path)` BEFORE the first jit of the process. Safe to call
when the directory does not exist (it is created), and a cache miss
just compiles as before — the cache never changes results, only
latency.
"""
from __future__ import annotations

import os


def enable(path: str = ".jax_cache") -> None:
    """Turn on JAX's on-disk compilation cache at `path` ('' disables)."""
    if not path:
        return
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    # default min is 1 s of compile time; render programs always qualify,
    # but keep the bar low so the viewer's small preview jits cache too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

"""Persistent XLA compilation cache for benchmark/gate entry points.

The on-chip sweep's dominant fixed cost is compilation (a single HIER
execution-gate cell measured 1710 s of compile in round 4, results_r4/
exec_gate.log); the quick-tier tests already amortize this via a
persistent cache (tests/conftest.py) but the benchmark scripts did not.
Call :func:`enable_persistent_cache` right after importing jax in every
benchmark entry point so a sweep rerun only pays for cells whose code
actually changed.

Reference analog: none — the reference's nvcc compiles happen once at
pip-install time (setup.py:17-35); JAX recompiles per process, so the
cache is the TPU-native equivalent of its ahead-of-time build.
"""

from __future__ import annotations

import os


def enable_persistent_cache(kind: str = "bench") -> str:
    """Point jax at a persistent on-disk compilation cache.

    ``kind`` namespaces the directory (bench vs test) so cache-size
    pruning on one tier never evicts the other's entries. The directory
    can be overridden with STP_BENCH_CACHE; set STP_BENCH_CACHE=off to
    disable (e.g. to get clean cold-compile timings).
    """
    override = os.environ.get("STP_BENCH_CACHE", "")
    if override.lower() in ("off", "0", "none"):
        return ""
    cache_dir = override or os.path.expanduser(f"~/.cache/stp_jax_{kind}_cache")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Compiles below ~2 s aren't worth the disk round-trip; everything that
    # hurts (blend kernels, full train steps) is far above it.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir

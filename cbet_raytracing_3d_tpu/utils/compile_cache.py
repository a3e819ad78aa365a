"""Persistent XLA/Mosaic compilation cache.

The reference pays its compile cost once, at nvcc build time (Makefile:11-12);
every run of `cbet-gpu` starts from a ready binary.  Under JAX the analog is
the persistent compilation cache: serialized executables keyed on HLO hash,
written to disk and reused across processes.  Measured through the tunneled
TPU backend (scripts/probe_compile_cache.py): a Mosaic trace-program compile
drops 2.8 s -> 1.0 s and a plain-XLA one 2.2 s -> 0.3 s on the second
process — and at BASELINE config-4 scale the per-segment Mosaic AOT
recompiles (~130-200 s each, ~610 s of a 925 s cold wall) are the dominant
cold cost this removes.

Call :func:`enable_persistent_cache` before the first compile (bench.py,
the CLI, and the config-4 scripts do).  Controlled by env:

* ``CBET_TPU_COMPILE_CACHE=0`` disables entirely;
* ``CBET_TPU_COMPILE_CACHE_DIR`` overrides the location (default
  ``~/.cache/cbet_raytracing_3d_tpu/xla``).

Safe by construction: entries are keyed on the full HLO + compile options +
jaxlib/backend version hash, so a stale entry can only miss, never corrupt.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently point JAX's persistent compilation cache at a disk dir.

    Returns the directory in use, or None when disabled by env."""
    global _ENABLED
    if os.environ.get("CBET_TPU_COMPILE_CACHE", "1") == "0":
        return None
    import jax

    if _ENABLED:
        current = jax.config.jax_compilation_cache_dir
        # warn only on an EXPLICITLY requested different dir (a None caller
        # just wants the cache on, wherever it already is)
        if cache_dir is not None and cache_dir != current:
            import sys
            print(f"warning: compilation cache already enabled at "
                  f"{current}; ignoring requested {cache_dir}",
                  file=sys.stderr)
        return current
    if cache_dir is None:
        cache_dir = os.environ.get("CBET_TPU_COMPILE_CACHE_DIR") or \
            os.path.join(os.path.expanduser("~"), ".cache",
                         "cbet_raytracing_3d_tpu", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache even fast compiles: through the tunnel every remote compile
    # costs seconds of round-trips regardless of its local cost
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _ENABLED = True
    return cache_dir

"""Persistent XLA compile cache shared by every CLI/script entry point.

Full-size train-step compiles cost minutes on the tunneled TPU backend
(PERF.md "Compile times"); the round-3 capstone measured 845 s of its
26-minute wall in compile stalls — more than half of it two eval-render
compiles. The reference has no analog (PyTorch eager). One shared on-disk
cache turns every repeat compile — re-runs, resumes, eval after train,
the per-plot eval renders, and DTU-suite scans sharing shapes — into a
sub-second cache hit.

Layout: ``MVSDF_COMPILE_CACHE`` env var if set, else
``JAX_COMPILATION_CACHE_DIR`` if set (the standard jax env var — keeps
external tooling and this module pointed at ONE cache), else ``.jax_cache/``
next to the package when that location is writable (repo checkouts), else
``~/.cache/mvsdf/jax_cache`` (site-packages installs can be read-only or
shared). ``MVSDF_COMPILE_CACHE=0`` disables.
"""
from __future__ import annotations

import os


def _default_cache_dir() -> str:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.access(repo_root, os.W_OK):
        return os.path.join(repo_root, ".jax_cache")
    return os.path.join(os.path.expanduser("~"), ".cache", "mvsdf",
                        "jax_cache")


def enable_persistent_cache() -> str | None:
    """Point jax at the shared persistent compile cache. Call before the
    first compilation; safe to call more than once. Returns the cache dir
    (None when disabled)."""
    loc = os.environ.get("MVSDF_COMPILE_CACHE") \
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if loc == "0":
        return None
    if not loc:
        loc = _default_cache_dir()
    import jax

    jax.config.update("jax_compilation_cache_dir", loc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return loc

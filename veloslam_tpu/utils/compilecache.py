"""Persistent XLA compilation cache for every veloslam_tpu entry point.

On the tunneled TPU backend a cold process pays remote compilation for
every distinct program — tens of seconds each, and the batched full-SLAM
path (decode → odometry → device finalize → host tail) compiles dozens.
JAX's persistent compilation cache serializes compiled executables to
disk keyed on (HLO, compile options, backend version), so every later
process — test reruns, the driver's end-of-round `python bench.py`, CLI
apps — loads them in milliseconds instead of recompiling.

The reference has no analog (a C++ binary compiles once at build time);
this restores that property for a JIT-compiled framework.  Enabling the
cache is always safe: entries are content-keyed, and any failure to set
it up degrades to normal compilation.
"""

import os


def enable(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path` (default:
    $VELOSLAM_COMPILE_CACHE or ~/.cache/veloslam_tpu/xla).  Returns the
    cache dir on success, None if the cache was not enabled.  Must run
    before the first jit compilation to cover it.

    CPU backends are deliberately excluded: XLA:CPU compiles in
    milliseconds, and its AOT cache entries embed host machine features —
    reloading them across even slightly different feature detections
    produces warning spam and a documented SIGILL risk.  (Note this call
    initializes the backend to find out.)"""
    import jax

    try:
        if jax.default_backend() == "cpu":
            return None
    except Exception:
        return None
    path = path or os.environ.get(
        "VELOSLAM_COMPILE_CACHE",
        os.path.expanduser("~/.cache/veloslam_tpu/xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything: the default thresholds skip small/fast
        # programs, but on a remote-compile backend even "fast" compiles
        # cost a network round trip.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return path
    except Exception:
        return None

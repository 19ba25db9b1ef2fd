"""Persistent XLA compilation cache for the CLI drivers.

The reference's workflow is many short-lived processes (one per flag
configuration, doc/DecodingCodelab.md:353-389) and this framework
keeps that flag surface — so on TPU backends, where each compile can
cost 5-60 s through a remote tunnel, every driver process re-paying
compilation would dominate small runs. Enabling JAX's persistent
cache amortizes compiles across processes: the second run of any
driver with the same shapes skips straight to execution.

CPU stays uncached on purpose: CPU AOT artifacts embed host machine
features and can SIGILL when replayed on a different host (and CPU
compiles are fast anyway).
"""

import os

_ENABLED = False


def enable_persistent_compilation_cache() -> bool:
    """Sets up the on-disk compile cache if the backend is TPU.

    Call from a driver main() (NOT at import time — inspecting
    jax.devices() initializes the backend, which would foreclose a
    library user's later platform configuration). Idempotent; returns
    whether the cache is active. Override the location with
    TDT_COMPILE_CACHE_DIR; set it empty to disable.
    """
    global _ENABLED
    if _ENABLED:
        return True
    cache_dir = os.environ.get(
        'TDT_COMPILE_CACHE_DIR',
        os.path.expanduser('~/.cache/jax_compilation'))
    if not cache_dir:
        return False
    try:
        import jax
        if jax.devices()[0].platform != 'tpu':
            return False
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
        _ENABLED = True
        return True
    except Exception:
        return False

"""Persistent XLA compile cache enablement.

The reference has no compile step; this framework's Pallas/XLA programs
do, and over this environment's tunneled remote-compile path a cold
compile costs minutes (BASELINE.md).  JAX only persists compiled
executables when ``jax_compilation_cache_dir`` is set **in the process
that compiles them** — the round-4 driver bench timed out precisely
because earlier CLI/engine processes had compiled everything without
the cache enabled, so a fresh process found only the two programs the
benchmarks themselves had persisted.  Every entry point (CLI group,
__graft_entry__, benchmarks, bench.py) therefore calls
:func:`enable_persistent_cache` before touching the engines.

``KSPIDER_JAX_CACHE`` overrides the directory; ``off`` disables.  The
default min-compile-time threshold (1 s) is kept, so the CPU test
suite's thousands of sub-second compiles don't bloat the cache.
"""

import os

_done = False


def enable_persistent_cache(path: str = None) -> None:
    """Idempotently point JAX's persistent compile cache at ``path``.

    Safe to call before or after backend init (the cache config is read
    at compile time).  Never overrides an explicitly-configured dir and
    never raises: a read-only filesystem just leaves caching off.
    """
    global _done
    if _done:
        return
    env = os.environ.get("KSPIDER_JAX_CACHE")
    if env == "off":
        _done = True
        return
    path = path or env or os.path.expanduser("~/.cache/jax")
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
        _done = True
    except Exception:  # pragma: no cover - e.g. read-only fs
        pass

"""Persistent XLA compilation cache, hardened against relay/libtpu skew.

First compiles through the remote-compile TPU path cost 30–250 s per
program; the persistent cache turns every subsequent process start into a
disk read (measured 11.8 s → 1.0 s). Entry points (trainer CLI, serving,
bench, graft entry) call this once; libraries never mutate global config.

Hardening (round-2, after MULTICHIP_r01's libtpu FAILED_PRECONDITION):

1. The cache directory is keyed by a client-side toolchain fingerprint
   (jax + jaxlib + libtpu wheel versions). A container upgrade that bumps
   any of them lands in a fresh directory instead of replaying executables
   AOT-compiled under the old toolchain.
2. ``with_cache_recovery(fn)`` wraps an entry point: if the first attempt
   dies with a stale-executable error (the relay rejecting an AOT
   executable with "libtpu version mismatch" / FAILED_PRECONDITION), the
   persistent cache is purged, in-memory jit caches are cleared, and the
   entry point is retried ONCE with the persistent cache disabled. A true
   client↔terminal skew (nothing cached at all) still fails, but a stale
   cache entry can no longer kill bench/run/serve.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Callable

_active_cache_dir: str | None = None


def _host_fingerprint() -> str:
    """Host CPU identity. XLA:CPU AOT executables are compiled for the
    build host's exact feature set (avx512*, amx-*, …); replaying one on a
    host with fewer features risks SIGILL — which no in-process recovery
    can catch. Folding the arch + /proc/cpuinfo flag set into the cache
    key sends each host shape to its own directory instead."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    digest = hashlib.sha256(flags.encode()).hexdigest()[:8]
    return f"{platform.machine()}-{digest}"


def _toolchain_fingerprint() -> str:
    """Client toolchain identity, computed WITHOUT initialising a backend."""
    import importlib.metadata

    import jax

    parts = [f"jax{jax.__version__}"]
    for dist in ("jaxlib", "libtpu", "libtpu-nightly"):
        try:
            parts.append(f"{dist}{importlib.metadata.version(dist)}")
        except importlib.metadata.PackageNotFoundError:
            pass
    parts.append(_host_fingerprint())
    return "-".join(parts).replace("/", "_")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    global _active_cache_dir
    import jax

    base = (
        cache_dir
        or os.environ.get("ECGMM_JAX_CACHE")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "ecgmm_tpu", "xla"
        )
    )
    full = os.path.join(base, _toolchain_fingerprint())
    os.makedirs(full, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", full)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _active_cache_dir = full
    return full


def disable_compilation_cache() -> None:
    global _active_cache_dir
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
    _active_cache_dir = None


def purge_compilation_cache() -> None:
    """Retire the active persistent cache directory — moved aside (one
    .stale backup kept), not deleted: every cached program is worth
    30–250 s of remote compile, and the stale-executable heuristic that
    triggers this is a string match that can fire on unrelated
    FAILED_PRECONDITION faults."""
    if _active_cache_dir and os.path.isdir(_active_cache_dir):
        bak = _active_cache_dir + ".stale"
        shutil.rmtree(bak, ignore_errors=True)
        try:
            os.replace(_active_cache_dir, bak)
        except OSError:
            shutil.rmtree(_active_cache_dir, ignore_errors=True)
        os.makedirs(_active_cache_dir, exist_ok=True)


def is_stale_executable_error(exc: BaseException) -> bool:
    """True if `exc` looks like the relay rejecting a stale AOT executable."""
    msg = str(exc)
    if "libtpu version mismatch" in msg:
        return True
    if "FAILED_PRECONDITION" in msg and (
        "libtpu" in msg or "AOT" in msg or "executable" in msg.lower()
    ):
        return True
    return False


def with_cache_recovery(fn: Callable[..., Any], *args: Any, **kwargs: Any):
    """Run an entry point; on a stale-executable error, purge + retry once.

    The retry runs with the persistent cache DISABLED so a poisoned entry
    (or a mid-flight relay upgrade) cannot fail the same way twice in one
    process. Non-cache errors propagate unchanged.
    """
    try:
        return fn(*args, **kwargs)
    except Exception as exc:  # noqa: BLE001 — filtered by predicate below
        if not is_stale_executable_error(exc):
            raise
        import sys

        import jax

        print(
            "ecgmm_tpu: stale compiled-executable error detected "
            f"({type(exc).__name__}); purging persistent compilation cache "
            "and retrying once without it.",
            file=sys.stderr,
        )
        purge_compilation_cache()
        disable_compilation_cache()
        jax.clear_caches()
        return fn(*args, **kwargs)

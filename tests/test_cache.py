"""Persistent-compile-cache hardening: toolchain-fingerprinted cache dirs
and stale-AOT-executable recovery (round-1 post-mortem: MULTICHIP_r01 died
on a libtpu FAILED_PRECONDITION replayed from the persistent cache)."""

import os

from ecgmm_tpu.utils import cache


def test_cache_dir_is_fingerprinted(tmp_path):
    d = cache.enable_compilation_cache(str(tmp_path))
    try:
        assert os.path.isdir(d)
        # keyed under the base by the client toolchain identity
        assert os.path.dirname(d) == str(tmp_path)
        assert "jax" in os.path.basename(d)
    finally:
        cache.disable_compilation_cache()


def test_fingerprint_includes_host_identity(monkeypatch):
    """XLA:CPU AOT executables are host-feature-specific (replaying one on
    a lesser host can SIGILL, which no in-process recovery catches): the
    cache key must separate hosts with different CPU feature sets."""
    fp1 = cache._toolchain_fingerprint()
    assert cache._host_fingerprint() in fp1
    monkeypatch.setattr(cache, "_host_fingerprint", lambda: "otherhost-ff")
    assert cache._toolchain_fingerprint() != fp1


def test_fingerprint_tracks_toolchain(monkeypatch, tmp_path):
    d1 = cache.enable_compilation_cache(str(tmp_path))
    monkeypatch.setattr(
        cache, "_toolchain_fingerprint", lambda: "jaxNEXT-libtpuNEXT"
    )
    d2 = cache.enable_compilation_cache(str(tmp_path))
    cache.disable_compilation_cache()
    assert d1 != d2  # an upgraded client lands in a fresh directory


def test_is_stale_executable_error():
    assert cache.is_stale_executable_error(
        RuntimeError(
            'FAILED_PRECONDITION: libtpu version mismatch: terminal has '
            '"TFRT TPU v5 lite ..." , client AOT libtpu has "..."'
        )
    )
    assert cache.is_stale_executable_error(
        RuntimeError("libtpu version mismatch: whatever")
    )
    assert not cache.is_stale_executable_error(ValueError("shape mismatch"))
    assert not cache.is_stale_executable_error(
        RuntimeError("RESOURCE_EXHAUSTED: out of memory")
    )


def test_with_cache_recovery_purges_and_retries(tmp_path):
    d = cache.enable_compilation_cache(str(tmp_path))
    poisoned = os.path.join(d, "stale_blob.bin")
    with open(poisoned, "wb") as f:
        f.write(b"\x00" * 16)

    calls = {"n": 0}

    def entry():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "FAILED_PRECONDITION: libtpu version mismatch: terminal ..."
            )
        return "ok"

    assert cache.with_cache_recovery(entry) == "ok"
    assert calls["n"] == 2
    assert not os.path.exists(poisoned)  # cache purged before retry
    # retry path disabled the persistent cache for the rest of the process
    import jax

    assert jax.config.jax_compilation_cache_dir in (None, "")


def test_with_cache_recovery_propagates_other_errors(tmp_path):
    cache.enable_compilation_cache(str(tmp_path))
    try:
        calls = {"n": 0}

        def entry():
            calls["n"] += 1
            raise ValueError("real bug")

        import pytest

        with pytest.raises(ValueError):
            cache.with_cache_recovery(entry)
        assert calls["n"] == 1
    finally:
        cache.disable_compilation_cache()

"""The driver-facing entry points: entry() compile-check and the
multi-chip sharded training dryrun on the 8-device CPU mesh."""

import importlib.util
import os

import jax


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_compiles():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 2)


def test_dryrun_multichip_8():
    m = _load()
    m.dryrun_multichip(8)  # raises on failure


def test_dryrun_multichip_2():
    m = _load()
    m.dryrun_multichip(2)


def test_dryrun_multichip_driver_pattern():
    """Reproduce the driver's exact call pattern: a fresh process WITHOUT
    the conftest CPU pin (so the sitecustomize-forced default backend — the
    relayed axon TPU in the real container — stays the default), importing
    __graft_entry__ and calling dryrun_multichip. Round-1 failed this
    (MULTICHIP_r01 ok=false, libtpu skew on the default backend); the fix
    re-execs the dryrun in a CPU-pinned subprocess, so the default backend
    is never initialised, let alone dispatched to."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "ECGMM_DRYRUN_CHILD")
    }
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import importlib.util, os\n"
        "spec = importlib.util.spec_from_file_location('graft_entry', %r)\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "m.dryrun_multichip(4)\n"
        "print('DRIVER_PATTERN_OK')\n"
    ) % (repo, os.path.join(repo, "__graft_entry__.py"))
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRIVER_PATTERN_OK" in proc.stdout
    assert "dryrun_multichip(4)" in proc.stdout


# Suite tiering: every test in this module is multi-second e2e work —
# the fast tier (pytest -m "not slow") skips it; CI and the full local
# run still execute it.
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow

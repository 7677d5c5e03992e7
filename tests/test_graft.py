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

"""Packaging metadata sanity: pyproject entry points resolve.

The reference is run as bare ``python <script>.py`` files
(/root/reference/README.md:76-79); this framework is an installable
package whose console scripts must keep pointing at real callables.
"""

import pathlib
import tomllib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def pyproject():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve(pyproject):
    import importlib

    scripts = pyproject["project"]["scripts"]
    assert len(scripts) >= 8
    for name, target in scripts.items():
        mod_name, fn_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, fn_name)
        assert callable(fn), f"{name} -> {target} is not callable"
        # Every CLI main takes argv=None so scripts and `python -m` share it.
        import inspect

        assert "argv" in inspect.signature(fn).parameters, name


def test_version_single_source(pyproject):
    import ecgmm_tpu

    assert pyproject["project"]["version"] == ecgmm_tpu.__version__


def test_native_source_ships(pyproject):
    pkg_data = pyproject["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in pkg_data["ecgmm_tpu.native"]
    assert (REPO / "ecgmm_tpu" / "native" / "preprocess.cpp").is_file()

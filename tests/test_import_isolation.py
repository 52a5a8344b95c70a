"""Import-isolation tests: every public submodule must import cleanly as the
FIRST torchain_tpu import of a fresh interpreter.

Regression guard for the round-2 circular import (`torchain_tpu.io` ->
data.loader -> data/__init__ -> kaldi_compat -> torchain_tpu.io), where the
full test suite stayed green only because alphabetically-earlier test files
imported torchain_tpu.data first.  Each module is imported in its own
subprocess so no sibling import can mask a cycle.
"""

import pathlib
import subprocess
import sys

import pytest

PKG_ROOT = pathlib.Path(__file__).resolve().parents[1]


def _all_modules():
    pkg = PKG_ROOT / "torchain_tpu"
    mods = []
    for py in sorted(pkg.rglob("*.py")):
        rel = py.relative_to(PKG_ROOT)
        parts = list(rel.with_suffix("").parts)
        if parts[-1] == "__init__":
            parts = parts[:-1]
        mods.append(".".join(parts))
    return mods


MODULES = _all_modules()


def test_module_list_nonempty():
    assert "torchain_tpu.io" in MODULES
    assert "torchain_tpu.data.kaldi_compat" in MODULES
    assert len(MODULES) > 30


@pytest.mark.parametrize("mod", MODULES)
def test_import_in_isolation(mod):
    proc = subprocess.run(
        [sys.executable, "-c", f"import {mod}"],
        cwd=str(PKG_ROOT),
        capture_output=True,
        text=True,
        env={
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": str(PKG_ROOT),
        },
        timeout=120,
    )
    assert proc.returncode == 0, f"import {mod} failed:\n{proc.stderr}"

"""Install story: every console script in pyproject.toml resolves and the
bundled data files ship with the package."""

import importlib
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scripts():
    try:
        import tomllib
    except ImportError:  # pragma: no cover
        pytest.skip("tomllib unavailable")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    return meta["project"]["scripts"]


def test_all_entry_points_resolve():
    scripts = _scripts()
    assert "minimizer" in scripts and "gfdb_build" in scripts
    for name, target in scripts.items():
        mod, func = target.split(":")
        m = importlib.import_module(mod)
        assert callable(getattr(m, func)), f"{name} -> {target}"


def test_package_data_bundled():
    import kiwi_tpu

    base = os.path.dirname(kiwi_tpu.__file__)
    assert os.path.exists(os.path.join(base, "data", "crust2x2", "CNtype2.txt"))
    assert os.listdir(os.path.join(base, "data", "phases"))


def test_console_script_runs_from_path():
    """After `pip install -e .`, the reference binary names work from PATH
    (skipped when the package isn't installed in this environment)."""
    import shutil

    exe = shutil.which("eulermt")
    if exe is None:
        pytest.skip("kiwi-tpu not pip-installed in this environment")
    r = subprocess.run([exe, "90", "87", "164"], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr
    assert "mxx" in r.stdout or "=" in r.stdout

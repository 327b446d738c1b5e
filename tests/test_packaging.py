"""Frozen-app packaging gates (reference: raw2film.spec:1-80).

PyInstaller is not installable in this zero-egress container, so the spec is
validated structurally: it must parse as Python, and every repo path it
bundles must exist. scripts/freeze_smoke.sh performs the real build+run on a
machine that has PyInstaller.
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = os.path.join(REPO, "raw2film_tpu.spec")


def test_spec_parses_as_python():
    with open(SPEC) as f:
        src = f.read()
    ast.parse(src, filename=SPEC)  # raises SyntaxError on a broken spec


def test_spec_referenced_paths_exist():
    # The spec joins specpath with these package-relative pieces; assert the
    # join targets exist so a rename does not silently break the frozen build.
    for rel in (
        ("raw2film_tpu", "native", "r2f_native.cc"),
        ("raw2film_tpu", "native", "Makefile"),
        ("raw2film_tpu", "__main__.py"),
        ("scripts", "freeze_smoke.sh"),
    ):
        path = os.path.join(REPO, *rel)
        assert os.path.exists(path), f"spec references missing {path}"


def test_spec_entry_matches_console_script():
    # Both entries must route to the same main(); the spec freezes
    # raw2film_tpu/__main__.py, pyproject's console script targets cli:main.
    with open(os.path.join(REPO, "raw2film_tpu", "__main__.py")) as f:
        assert "from raw2film_tpu.cli import main" in f.read()
    with open(os.path.join(REPO, "pyproject.toml")) as f:
        assert 'raw2film-tpu = "raw2film_tpu.cli:main"' in f.read()


def test_module_entry_and_version_flag():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "raw2film_tpu", "--version"],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    from raw2film_tpu._version import __version__

    assert out.stdout.strip() == f"raw2film-tpu {__version__}"


def test_freeze_smoke_skips_cleanly_without_pyinstaller():
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "freeze_smoke.sh")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr
    # Either a real build happened (OK) or it skipped for lack of PyInstaller.
    assert "freeze_smoke: OK" in out.stdout or "freeze_smoke: SKIP" in out.stdout

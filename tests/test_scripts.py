"""CLI smoke tests: every script must import and parse --help.

Catches broken imports/argparse in the script layer, which nothing else in
the suite touches.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SCRIPTS = sorted(p.name for p in (REPO / "scripts").glob("*.py"))


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_help(script):
    result = subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), "--help"],
        capture_output=True,
        text=True,
        timeout=180,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "PYTHONPATH": str(REPO)},
    )
    assert result.returncode == 0, f"{script} --help failed:\n{result.stderr[-2000:]}"
    assert "usage" in result.stdout.lower()


def test_graft_entry_importable():
    result = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__"],
        capture_output=True, text=True, timeout=180, cwd=REPO,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "PYTHONPATH": str(REPO)},
    )
    assert result.returncode == 0, result.stderr[-2000:]

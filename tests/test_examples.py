"""Examples stay runnable — each owns its Ray session, so they run as
subprocesses (two representative ones; all six ran green when authored)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("name", ["simple", "dist", "search_ux",
                                  "train_shards", "ann_quantized"])
def test_example_runs(name):
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", f"{name}.py")],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env={**os.environ, "RAY_ADDRESS": ""},
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert p.stdout.strip(), "example printed nothing"

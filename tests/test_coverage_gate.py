"""The reference CI's coverage bar, wired into this suite.

/root/reference/.github/workflows/tests.yml:50-53 fails CI under 100%
line coverage of tinymr.  core.py is this repo's tinymr-equivalent, so
the same bar applies there: tools/coverage_gate.py traces the core
test modules in a subprocess (its settrace tracer must own the whole
interpreter, so it cannot run in-process with this suite) and fails
below 100%.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_layer_line_coverage_is_100():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "coverage_gate.py")],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    tail = (res.stdout or "")[-3000:] + (res.stderr or "")[-1000:]
    assert res.returncode == 0, f"coverage gate failed:\n{tail}"
    assert "coverage gate: PASS (100%)" in res.stdout, tail

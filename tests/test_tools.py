"""CLI tools: golden-log comparison parses the reference's committed log."""

import os
import subprocess
import sys

import pytest

GOLDEN = "/root/reference/results/test.log"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.isfile(GOLDEN), reason="no reference checkout")
def test_compare_golden_self_identity():
    r = subprocess.run(
        [sys.executable, "tools/compare_golden.py", "--ours", GOLDEN,
         "--golden", GOLDEN, "--table_index", "0"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Average" in r.stdout
    assert "max |delta| any row: 0.00" in r.stdout


@pytest.mark.skipif(not os.path.isfile(GOLDEN), reason="no reference checkout")
def test_compare_golden_detects_regression(tmp_path):
    # perturb one Average metric by 1 point -> non-zero exit
    text = open(GOLDEN).read()
    bad = text.replace("91.88", "90.88", 1)
    p = tmp_path / "bad.log"
    p.write_text(bad)
    r = subprocess.run(
        [sys.executable, "tools/compare_golden.py", "--ours", str(p),
         "--golden", GOLDEN, "--table_index", "0"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 1, r.stdout

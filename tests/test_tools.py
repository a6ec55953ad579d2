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
def test_compare_golden_truncated_log_is_an_error(tmp_path):
    """A log with class rows but no Average row (run killed mid-eval) must
    exit non-zero, not pass vacuously (round-3 review finding)."""
    lines = [l for l in open(GOLDEN).read().splitlines()
             if "Average" not in l]
    p = tmp_path / "truncated.log"
    p.write_text("\n".join(lines))
    r = subprocess.run(
        [sys.executable, "tools/compare_golden.py", "--ours", str(p),
         "--golden", GOLDEN, "--table_index", "0"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 2, r.stdout + r.stderr
    assert "Average" in r.stderr


def test_make_few_shot_shot_files_are_shot_independent(tmp_path, monkeypatch):
    """K-shot output must depend only on (seed, K), not on which other
    --shots ran in the same invocation (round-3 review finding: the
    include_anomalous branch shuffled the class list in place)."""
    import json

    meta = tmp_path / "meta" / "MVTec"
    meta.mkdir(parents=True)
    recs = [{"class_name": "bottle", "label": i % 2,
             "img_path": f"i{i}.png",
             **({"mask_path": f"m{i}.png"} if i % 2 else {})}
            for i in range(10)]
    (meta / "full-shot.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs) + "\n")
    monkeypatch.setenv("AACLIP_METADATA", str(tmp_path / "meta"))

    import tools.make_few_shot as mfs

    mfs.main(["--dataset", "MVTec", "--shots", "1", "2",
              "--include_anomalous"])
    both = (meta / "2-shot.jsonl").read_text()
    (meta / "2-shot.jsonl").unlink()
    mfs.main(["--dataset", "MVTec", "--shots", "2", "--include_anomalous"])
    alone = (meta / "2-shot.jsonl").read_text()
    assert both == alone


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

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


def test_spearman_helper():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import numpy as np
    import precision_ab as pab

    x = np.arange(10, dtype=float)
    assert pab._spearman(x, x) == pytest.approx(1.0)
    assert pab._spearman(x, -x) == pytest.approx(-1.0)
    # monotone transform leaves rho at 1 (rank-based)
    assert pab._spearman(x, np.exp(x / 3)) == pytest.approx(1.0)
    # ties handled via average ranks: still symmetric
    a = np.array([1.0, 1.0, 2.0, 3.0])
    b = np.array([3.0, 2.0, 1.0, 1.0])
    assert pab._spearman(a, b) == pytest.approx(pab._spearman(b, a))


def test_hard_synthetic_dataset_shape(tmp_path):
    """--hard mode: variable defects, distractors on normals, masks only on
    anomalous images; record counts match the requested shape."""
    import json

    import numpy as np
    from PIL import Image

    from aaclip_tpu.data.synthetic import make_synthetic_dataset

    data_root, meta_root = make_synthetic_dataset(
        str(tmp_path), n_normal=6, n_anomalous=6, img_px=64, hard=True)
    recs = [json.loads(l) for l in
            open(os.path.join(meta_root, "MVTec", "full-shot.jsonl"))]
    assert len(recs) == 2 * 12
    labels = [r["label"] for r in recs]
    assert sum(labels) == 12
    areas = []
    for r in recs:
        if r["label"]:
            assert "mask_path" in r
            from aaclip_tpu.data.registry import DATASETS
            m = np.asarray(Image.open(os.path.join(
                data_root, DATASETS["MVTec"].rel_path, r["mask_path"])))
            areas.append(int((m > 0).sum()))
        else:
            assert "mask_path" not in r
    # hard mode draws variable defect sizes — they must actually vary
    assert len(set(areas)) > 1


def test_precision_ab_smoke(tmp_path, monkeypatch):
    """End-to-end A/B harness on the tiny model (CPU): fp32 vs fp32_high
    must pass the granularity-aware verdict including the Spearman gate,
    and the stash/compare_only plumbing must round-trip."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import precision_ab as pab

    monkeypatch.chdir(REPO)
    work = str(tmp_path / "ab")
    common = [
        "--workdir", work, "--keep",
        "--model_name", "tiny-test", "--img_size", "70",
        "--levels", "1", "2",
        "--text_adapt_until", "1", "--image_adapt_until", "1",
        "--n_classes", "1", "--n_normal", "4", "--n_anomalous", "4",
        "--hard", "--baseline", "fp32", "--candidate", "fp32_high",
        "--text_batch_size", "4", "--image_batch_size", "4",
        "--eval_batch_size", "4", "--num_workers", "2",
        "--pixel_tol", "0.5",
    ]
    pab.main(common)  # exit 0 = no SystemExit raised
    # stashed pair exists exactly once per tag, scores alongside
    import glob as g
    ckpt = os.path.join(work, "ckpt_ab")
    for tag in ("fp32", "fp32_high"):
        assert len(g.glob(os.path.join(ckpt, f"ab__{tag}__results_*.csv"))) == 1
        assert len(g.glob(os.path.join(ckpt, f"ab__{tag}__scores_*.csv"))) == 1
    # --compare_only re-verdicts the stashed pair without retraining
    pab.main(["--compare_only", ckpt,
              "--baseline", "fp32", "--candidate", "fp32_high",
              "--n_normal", "4", "--n_anomalous", "4", "--pixel_tol", "0.5"])
    # ambiguous stash (a second results CSV for one tag) must be rejected
    dup = g.glob(os.path.join(ckpt, "ab__fp32__results_*.csv"))[0]
    import shutil
    shutil.copy(dup, dup.replace("results_1", "results_2"))
    with pytest.raises(SystemExit, match="exactly one"):
        pab.main(["--compare_only", ckpt,
                  "--baseline", "fp32", "--candidate", "fp32_high",
                  "--n_normal", "4", "--n_anomalous", "4"])


def test_host_loop_profiler():
    """HostLoopProfiler: first (compile) step excluded, phases accumulate,
    disabled mode is a transparent passthrough."""
    import time

    from aaclip_tpu.utils.profiling import HostLoopProfiler

    prof = HostLoopProfiler()
    seen = []
    for batch in prof.wrap([1, 2, 3]):
        with prof.phase("work"):
            time.sleep(0.001)
        seen.append(batch)
    assert seen == [1, 2, 3]
    report = prof.report()
    assert "loader_wait" in report and "work" in report
    # 3 batches, first skipped -> 2 profiled work phases; loader_wait also
    # counts the terminal StopIteration wait (real end-of-epoch waiting)
    assert prof._acc["work"][0] == 2
    assert prof._acc["loader_wait"][0] in (2, 3)

    off = HostLoopProfiler(enabled=False)
    assert list(off.wrap([4, 5])) == [4, 5]
    with off.phase("x"):
        pass
    assert off.report() == ""


def test_throttled_loss_drain():
    """ThrottledLossDrain: values come back complete and in step order,
    blocking fetches happen only on throttle boundaries, and device
    arrays' async-copy hook is exercised."""
    import jax.numpy as jnp

    from aaclip_tpu.utils.profiling import ThrottledLossDrain

    # device scalars (CPU backend under conftest): ordering + completeness
    d = ThrottledLossDrain(fetch_every=4)
    for i in range(11):
        d.append(jnp.float32(i))
    assert d.drain() == [float(i) for i in range(11)]
    assert d.drain() == []  # reset after drain

    # throttle boundaries: a probe type counts blocking float() calls
    class Probe:
        blocked = 0

        def __init__(self, v):
            self.v = v

        def __float__(self):
            Probe.blocked += 1
            return float(self.v)

    d = ThrottledLossDrain(fetch_every=3)
    for i in range(9):
        d.append(Probe(i))
    # blocks at appends 6 and 9 (len>k and len%k==0), on items 2 and 5
    assert Probe.blocked == 2
    vals = d.drain()
    assert vals == [float(i) for i in range(9)]

    # fetch_every=1 ≈ the old per-step fetch: blocks every append past k
    Probe.blocked = 0
    d = ThrottledLossDrain(fetch_every=1)
    for i in range(5):
        d.append(Probe(i))
    assert Probe.blocked == 4

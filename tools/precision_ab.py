"""Chip A/B: evaluate ONE trained checkpoint at two precisions; diff the
task-metric tables and the per-image score ranking.

Generalizes the round-3 int8-vs-bf16 harness (tools/int8_ab.py, now a thin
shim over this) to any baseline/candidate precision pair, including the
staged trunk (--candidate_bf16_until N on an fp32_high candidate), and to
arbitrarily large synthetic evals so the metric granularity can be driven
well below the claimed deltas:

- one image-level rank flip on an n_pos x n_neg class eval moves AUROC by
  100/(n_pos*n_neg) points — derived from the ACTUAL --n_normal /
  --n_anomalous used to build the dataset (16x16 default = 0.39 points,
  vs the round-3 8x8 run's 1.56);
- --hard makes the image task unsaturated by construction (variable-
  contrast defects + bright distractors on normals,
  aaclip_tpu/data/synthetic.py) so AUROC 100.0 can't mask rank flips;
- beyond the table diff, --dump_scores feeds a Spearman rank correlation
  over every per-image anomaly score, the direct measure of "does the
  candidate precision rank images the same way".

The protocol being mirrored is the reference's per-class eval loop +
Average row (/root/reference/test.py:202-250); metric definitions
/root/reference/forward_utils.py:233-280.  The precision axis is ours
alone (the reference is fp32-only CUDA).

Usage:
  python tools/precision_ab.py                      # bf16 vs int8
  python tools/precision_ab.py --baseline fp32 \
      --candidate fp32_high --candidate_bf16_until 12
Exit 0 = tables agree within the granularity-aware tolerances (or exactly,
--strict) AND Spearman rho >= --min_rho.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRECISIONS = ("fp32", "fp32_high", "bf16", "int8")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None)
    p.add_argument("--model_name", default="ViT-L-14-336")
    p.add_argument("--img_size", type=int, default=518)
    p.add_argument("--baseline", default="bf16", choices=PRECISIONS)
    p.add_argument("--candidate", default="int8", choices=PRECISIONS)
    p.add_argument("--baseline_bf16_until", type=int, default=None,
                   help="staged-trunk depth for the baseline eval "
                        "(test.py --bf16_until)")
    p.add_argument("--baseline_int8_until", type=int, default=None,
                   help="mixed-prefix quantization depth for an int8 "
                        "baseline (test.py --int8_until)")
    p.add_argument("--candidate_int8_until", type=int, default=None,
                   help="mixed-prefix quantization depth for an int8 "
                        "candidate — the round-5 rescue experiment: "
                        "quantize blocks [0,K), keep the det-token tail "
                        "bf16")
    p.add_argument("--candidate_bf16_until", type=int, default=None,
                   help="staged-trunk depth for the candidate eval")
    p.add_argument("--n_classes", type=int, default=2,
                   help="synthetic classes (MVTec class names)")
    p.add_argument("--n_normal", type=int, default=16,
                   help="normal test images per class")
    p.add_argument("--n_anomalous", type=int, default=16,
                   help="anomalous test images per class")
    p.add_argument("--hard", action="store_true",
                   help="unsaturated image task by construction (variable-"
                        "contrast defects, distractors on normals)")
    p.add_argument("--text_batch_size", type=int, default=16)
    p.add_argument("--image_batch_size", type=int, default=8)
    p.add_argument("--eval_batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=4)
    # tiny-config overrides (CPU smoke: --model_name tiny-test --img_size 70
    # --levels 1 2 --text_adapt_until 1 --image_adapt_until 1)
    p.add_argument("--levels", type=int, nargs="+", default=None)
    p.add_argument("--text_adapt_until", type=int, default=None)
    p.add_argument("--image_adapt_until", type=int, default=None)
    p.add_argument("--keep", action="store_true",
                   help="keep the workdir (default: temp dir, left behind "
                        "only if the A/B fails)")
    p.add_argument("--strict", action="store_true",
                   help="demand digit-identical tables instead of the "
                        "granularity-aware tolerances")
    p.add_argument("--pixel_tol", type=float, default=0.25,
                   help="max allowed |delta| in points for pixel-level "
                        "columns (AUC/AP/AUPRO over ~2.1M pixels per class)")
    p.add_argument("--image_flips", type=int, default=3,
                   help="max allowed image-level |delta| in units of one "
                        "rank flip = 100/(n_normal*n_anomalous) points per "
                        "class (recomputed from the actual dataset shape)")
    p.add_argument("--min_rho", type=float, default=0.99,
                   help="min Spearman rank correlation between the two "
                        "precisions' per-image scores (pooled, and worst "
                        "per class)")
    p.add_argument("--compare_only", default=None, metavar="CKPT_DIR",
                   help="skip train/eval; re-verdict the ab__<prec>__*.csv "
                        "pair already stashed in CKPT_DIR (a kept workdir's "
                        "ckpt_ab/). Requires exactly one stash per "
                        "precision; flip granularity then comes from "
                        "--n_normal/--n_anomalous, which must match the "
                        "run that produced the stash")
    return p.parse_args(argv)


def _snap_epoch(name):
    # results_<epoch>.csv with NO zero padding: lexicographic order puts
    # 10 before 2 (same trap test.py:269-277 fixes for snapshots)
    m = re.search(r"_(\d+)\.csv$", name)
    return int(m.group(1)) if m else -1


def _tags(args):
    """Distinct stash tags for the two evals (bf16_until / int8_until
    make e.g. fp32_high-vs-fp32_high@12 or int8-vs-int8#18 legal pairs)."""
    def tag(prec, until, i8):
        t = prec if until is None else f"{prec}@{until}"
        return t if i8 is None else f"{t}#{i8}"
    return (tag(args.baseline, args.baseline_bf16_until,
                args.baseline_int8_until),
            tag(args.candidate, args.candidate_bf16_until,
                args.candidate_int8_until))


def main(argv=None):
    args = parse_args(argv)
    if (args.baseline, args.baseline_bf16_until,
            args.baseline_int8_until) == \
            (args.candidate, args.candidate_bf16_until,
             args.candidate_int8_until):
        raise SystemExit("baseline and candidate are the same configuration")
    # validate the int8_until/precision pairing NOW: test.py would reject
    # it too, but only AFTER the expensive training phase already ran
    for side, prec, i8 in (("baseline", args.baseline,
                            args.baseline_int8_until),
                           ("candidate", args.candidate,
                            args.candidate_int8_until)):
        if i8 is not None and prec != "int8":
            raise SystemExit(
                f"--{side}_int8_until requires --{side} int8 (got {prec})")
        if i8 is not None:
            # bounds-check the depth too: an out-of-range K would
            # otherwise die in the eval AFTER the expensive train phase
            from aaclip_tpu.core.config import get_config
            layers = get_config(args.model_name).vision.layers
            if not 0 <= i8 <= layers:
                raise SystemExit(
                    f"--{side}_int8_until {i8} out of range for the "
                    f"{layers}-layer {args.model_name} tower")

    import pandas as pd

    base_tag, cand_tag = _tags(args)

    if args.compare_only:
        tables, scores = {}, {}
        for tag in (base_tag, cand_tag):
            hits = sorted(glob.glob(
                os.path.join(args.compare_only, f"ab__{tag}__results_*.csv")),
                key=_snap_epoch)
            if len(hits) != 1:
                raise SystemExit(
                    f"need exactly one ab__{tag}__results_*.csv under "
                    f"{args.compare_only}, found {len(hits)} — a reused "
                    "workdir with multiple stashes can silently pair "
                    "tables from different runs; clean it up first")
            tables[tag] = pd.read_csv(hits[0]).round(2)
            sc = hits[0].replace("__results_", "__scores_")
            if os.path.exists(sc):
                scores[tag] = pd.read_csv(sc)
        verdict(tables, scores, args, root=args.compare_only, keep=True)
        return

    from aaclip_tpu.data.registry import DATASETS
    from aaclip_tpu.data.synthetic import make_synthetic_dataset

    root = args.workdir or tempfile.mkdtemp(prefix="aaclip_ab_")
    class_names = tuple(DATASETS["MVTec"].class_names[:args.n_classes])
    data_root, meta_root = make_synthetic_dataset(
        root, img_px=args.img_size, class_names=class_names,
        n_normal=args.n_normal, n_anomalous=args.n_anomalous,
        hard=args.hard)
    os.environ["AACLIP_DATA"] = data_root
    os.environ["AACLIP_METADATA"] = meta_root
    n_imgs = args.n_classes * (args.n_normal + args.n_anomalous)
    print(f"synthetic dataset under {root}: {n_imgs} images "
          f"({args.n_classes} classes x {args.n_normal}+{args.n_anomalous}"
          f"{', hard' if args.hard else ''})", flush=True)

    import test as test_cli
    import train as train_cli

    common = [
        "--model_name", args.model_name, "--img_size", str(args.img_size),
        "--dataset", "MVTec", "--num_workers", str(args.num_workers),
    ]
    if args.levels is not None:
        common += ["--levels"] + [str(v) for v in args.levels]
    if args.text_adapt_until is not None:
        common += ["--text_adapt_until", str(args.text_adapt_until)]
    if args.image_adapt_until is not None:
        common += ["--image_adapt_until", str(args.image_adapt_until)]
    save = os.path.join(root, "ckpt_ab")
    t0 = time.time()
    train_cli.main(common + [
        "--precision", "bf16", "--save_path", save,
        "--training_mode", "full_shot",
        "--text_epoch", "1", "--image_epoch", "1",
        "--text_batch_size", str(args.text_batch_size),
        "--image_batch_size", str(args.image_batch_size),
        "--device_augment",
    ])
    t1 = time.time()
    print(f"train (1+1 epoch bf16): {t1 - t0:.0f}s", flush=True)

    tables, scores = {}, {}
    for tag, prec, until, i8 in (
            (base_tag, args.baseline, args.baseline_bf16_until,
             args.baseline_int8_until),
            (cand_tag, args.candidate, args.candidate_bf16_until,
             args.candidate_int8_until)):
        ts = time.time()
        extra = ["--bf16_until", str(until)] if until is not None else []
        if i8 is not None:
            extra += ["--int8_until", str(i8)]
        test_cli.main(common + extra + [
            "--precision", prec, "--save_path", save,
            "--batch_size", str(args.eval_batch_size),
            "--aupro", "--csv", "--dump_scores",
        ])
        # test.py writes results_<epoch>.csv / scores_<epoch>.csv into
        # save_path; stash them under tag-suffixed names so the second
        # eval can't clobber them.
        for kind in ("results", "scores"):
            csvs = sorted((f for f in os.listdir(save)
                           if f.startswith(f"{kind}_") and f.endswith(".csv")
                           and "__" not in f), key=_snap_epoch)
            if not csvs:
                raise RuntimeError(f"{tag}: no {kind}_*.csv under {save}")
            stash = os.path.join(save, f"ab__{tag}__{csvs[-1]}")
            shutil.move(os.path.join(save, csvs[-1]), stash)
            for leftover in csvs[:-1]:  # earlier-epoch tables: not compared
                os.remove(os.path.join(save, leftover))
            df = pd.read_csv(stash)
            if kind == "results":
                # compare at the reference's printed precision (2 decimals)
                tables[tag] = df.round(2)
                print(f"eval {tag}: {time.time() - ts:.0f}s\n"
                      f"{tables[tag].to_string(index=False)}", flush=True)
            else:
                scores[tag] = df

    verdict(tables, scores, args, root=root,
            keep=args.keep or args.workdir is not None)


def _spearman(x, y):
    """Spearman rho with average-rank ties (numpy only)."""
    import numpy as np

    def rank(v):
        v = np.asarray(v, dtype=np.float64)
        order = np.argsort(v, kind="stable")
        r = np.empty(len(v))
        r[order] = np.arange(1, len(v) + 1, dtype=np.float64)
        # average ties
        for val in np.unique(v):
            m = v == val
            if m.sum() > 1:
                r[m] = r[m].mean()
        return r

    rx, ry = rank(x), rank(y)
    rx -= rx.mean()
    ry -= ry.mean()
    denom = np.sqrt((rx * rx).sum() * (ry * ry).sum())
    return float((rx * ry).sum() / denom) if denom else 1.0


def verdict(tables, scores, args, root, keep):
    import pandas as pd

    base_tag, cand_tag = _tags(args)
    a, b = tables[base_tag], tables[cand_tag]
    num_cols = [c for c in a.columns
                if pd.api.types.is_numeric_dtype(a[c])]
    # one image-level rank flip, derived from the dataset actually built
    flip = 100.0 / (args.n_normal * args.n_anomalous)
    print(f"\nper-column max |{base_tag} - {cand_tag}| (points):")
    failures = []
    for col in num_cols:
        d = (a[col] - b[col]).abs().max()
        is_pixel = "pixel" in col.lower() or "aupro" in col.lower()
        if args.strict:
            tol, unit = 0.0, "strict"
        elif is_pixel:
            tol, unit = args.pixel_tol, f"pixel tol {args.pixel_tol}"
        else:
            tol = args.image_flips * flip
            unit = f"{args.image_flips} flips x {flip:.4g}"
        ok = d <= tol
        print(f"  {col}: {d:.2f} (allowed {tol:.2f} = {unit}) "
              f"{'ok' if ok else 'FAIL'}")
        if not ok:
            failures.append(col)

    # rank correlation over the per-image scores, if both dumps exist
    if base_tag in scores and cand_tag in scores:
        sa = scores[base_tag].sort_values(["class name", "file"])
        sb = scores[cand_tag].sort_values(["class name", "file"])
        if list(sa["file"]) != list(sb["file"]):
            failures.append("score-file-mismatch")
            print("  per-image score files differ between runs — "
                  "cannot correlate")
        else:
            pooled = _spearman(sa["image_score"], sb["image_score"])
            worst, worst_cls = 2.0, None
            for cls, ga in sa.groupby("class name"):
                gb = sb[sb["class name"] == cls]
                rho = _spearman(ga["image_score"], gb["image_score"])
                if rho < worst:
                    worst, worst_cls = rho, cls
            print(f"  image-score Spearman rho: pooled {pooled:.4f}, "
                  f"worst class {worst:.4f} ({worst_cls}) "
                  f"(min {args.min_rho})")
            if min(pooled, worst) < args.min_rho:
                failures.append("spearman-rho")
    else:
        print("  (no per-image score dumps stashed — rank correlation "
              "skipped)")

    if failures:
        diff = (a != b)
        print(f"\nDIFFERING CELLS ({base_tag} vs {cand_tag}):")
        for col in a.columns:
            for i in diff.index[diff[col]]:
                print(f"  row {i} col {col}: {a.at[i, col]} vs {b.at[i, col]}")
        print(f"\nartifacts kept under {root}")
        raise SystemExit(f"PRECISION A/B: out of tolerance: {failures}")
    print("\nPRECISION A/B OK: " + (
        "tables identical to every reported digit" if args.strict else
        f"pixel metrics within {args.pixel_tol} points, image metrics "
        f"within {args.image_flips} rank flips of the {flip:.4g}-point "
        "eval granularity, score ranking preserved"))
    if not keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

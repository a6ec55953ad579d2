"""Chip A/B: int8 quantized inference vs bf16 on the SAME trained checkpoint.

The claim being verified (docs/PERFORMANCE.md "int8 quantized inference"):
evaluating one bf16-trained stage-1+stage-2 checkpoint with
`test.py --aupro` at bf16 and at int8 moves pixel-level metrics by at most
rounding noise and image-level metrics by at most a couple of rank flips
among borderline pairs.  This tool makes that a one-command, reproducible
measurement: it builds a synthetic 16-image-per-class dataset at the
production image size, trains one epoch per stage at bf16, evaluates the
same checkpoint at both precisions (per-precision CSV export), and diffs
the tables.

Verdict: pixel columns (pixel AUC/AP/AUPRO) must agree within --pixel_tol
points; image columns within --image_flips rank flips, where one flip on
an n_pos x n_neg class eval is 100/(n_pos*n_neg) AUROC points (1.5625 for
the default 8x8 synthetic classes — image metrics on a 16-image eval are
intrinsically that coarse).  `--strict` demands digit equality instead,
which holds when the task saturates (the round-3 mid-round run: image
AUROC 100.0) but not in general — see PERFORMANCE.md.

Reference protocol being mirrored: /root/reference/test.py:53-99 (the
per-class eval loop + Average row); the int8 path is ours alone (the
reference has no quantized mode).

Usage: python tools/int8_ab.py [--img_size 518] [--keep] [--strict]
Exit 0 = tables agree within the tolerances above (or exactly, --strict);
2-decimal comparisons match the reference's printed precision.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None)
    p.add_argument("--model_name", default="ViT-L-14-336")
    p.add_argument("--img_size", type=int, default=518)
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
                        "rank flip = 100/(n_pos*n_neg) points per class")
    p.add_argument("--compare_only", default=None, metavar="CKPT_DIR",
                   help="skip train/eval; re-verdict the ab__<prec>__*.csv "
                        "pair already stashed in CKPT_DIR (a kept workdir's "
                        "ckpt_ab/)")
    args = p.parse_args(argv)

    import pandas as pd

    if args.compare_only:
        import glob
        tables = {}
        for prec in ("bf16", "int8"):
            hits = sorted(glob.glob(
                os.path.join(args.compare_only, f"ab__{prec}__*.csv")))
            if not hits:
                raise SystemExit(
                    f"no ab__{prec}__*.csv under {args.compare_only}")
            tables[prec] = pd.read_csv(hits[-1]).round(2)
        verdict(tables, args, root=args.compare_only, keep=True)
        return

    from aaclip_tpu.data.synthetic import make_synthetic_dataset

    root = args.workdir or tempfile.mkdtemp(prefix="aaclip_int8ab_")
    # 16 images/class (8 good + 8 defect), 2 classes — the PERFORMANCE.md
    # staged-precision methodology shape.
    data_root, meta_root = make_synthetic_dataset(
        root, img_px=args.img_size, n_normal=8, n_anomalous=8)
    os.environ["AACLIP_DATA"] = data_root
    os.environ["AACLIP_METADATA"] = meta_root
    print(f"synthetic dataset under {root}", flush=True)

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

    tables = {}
    for prec in ("bf16", "int8"):
        ts = time.time()
        test_cli.main(common + [
            "--precision", prec, "--save_path", save,
            "--batch_size", str(args.eval_batch_size), "--aupro", "--csv",
        ])
        # test.py writes results_<epoch>.csv into save_path; stash it under
        # a precision-suffixed name so the second eval can't clobber it.
        csvs = sorted(f for f in os.listdir(save)
                      if f.startswith("results_") and f.endswith(".csv")
                      and "__" not in f)
        if not csvs:
            raise RuntimeError(f"{prec}: no results_*.csv under {save}")
        stash = os.path.join(save, f"ab__{prec}__{csvs[-1]}")
        shutil.move(os.path.join(save, csvs[-1]), stash)
        df = pd.read_csv(stash)
        # compare at the reference's printed precision (2 decimals)
        tables[prec] = df.round(2)
        print(f"eval {prec}: {time.time() - ts:.0f}s\n"
              f"{tables[prec].to_string(index=False)}", flush=True)

    verdict(tables, args, root=root,
            keep=args.keep or args.workdir is not None)


def verdict(tables, args, root, keep):
    import pandas as pd

    a, b = tables["bf16"], tables["int8"]
    num_cols = [c for c in a.columns
                if pd.api.types.is_numeric_dtype(a[c])]
    flip = 100.0 / (8 * 8)  # one image-level rank flip on 8 pos x 8 neg
    print("\nper-column max |bf16 - int8| (points):")
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
    if failures:
        diff = (a != b)
        print("\nDIFFERING CELLS (bf16 vs int8):")
        for col in a.columns:
            for i in diff.index[diff[col]]:
                print(f"  row {i} col {col}: {a.at[i, col]} vs {b.at[i, col]}")
        print(f"\nartifacts kept under {root}")
        raise SystemExit(f"INT8 A/B: columns out of tolerance: {failures}")
    print("\nINT8 A/B OK: " + (
        "tables identical to every reported digit" if args.strict else
        "pixel metrics within rounding, image metrics within "
        f"{args.image_flips} rank flips of the {flip:.4g}-point eval "
        "granularity"))
    if not keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""On-chip few-shot soak: 1/2/4-shot two-stage training + eval.

BASELINE.json experiment config #5 calls for few-shot two-stage adapter
training end-to-end; the reference's protocol is ``--training_mode few_shot
--shot K`` (reference train.py:191-197) over K records per class sampled
from the metadata (reference dataset/__init__.py:189-197). The CLI flow is
CPU-tested in tests/test_e2e_cli.py::test_few_shot_flow; this script drives
the same path at production shapes (ViT-L-14-336 @ 518) on real hardware so
the few-shot path has a chip-verified number.

It generates a synthetic 518px dataset, derives K-shot metadata with
tools/make_few_shot.py (``--include_anomalous`` so the tiny support sets
carry localization signal for the random-backbone smoke), then for each K
runs the real train.py (both stages, few_shot mode) and test.py --aupro and
prints one summary line per K.

    python -u tools/few_shot_soak.py --shots 1 2 4 --precision bf16 \
        --workdir /tmp/fewshot_soak
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def last_average_row(log_path: str):
    """(pixel AUC, pixel AP, image AUC, image AP[, AUPRO]) of the final
    snapshot's Average row in a test.py log."""
    rows = [l for l in open(log_path) if re.search(r"^\s*Average\s", l)]
    if not rows:
        return None
    return [float(x) for x in rows[-1].split()[1:]]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None)
    p.add_argument("--shots", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--model_name", default="ViT-L-14-336")
    p.add_argument("--img_size", type=int, default=518)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--text_epoch", type=int, default=2)
    p.add_argument("--image_epoch", type=int, default=2)
    p.add_argument("--text_batch_size", type=int, default=16)
    p.add_argument("--image_batch_size", type=int, default=8)
    p.add_argument("--eval_batch_size", type=int, default=8)
    p.add_argument("--host_augment", action="store_true",
                   help="use the host augmentation path instead of "
                        "--device_augment (the soak default is all "
                        "TPU-side features on)")
    p.add_argument("--memory_bank", action="store_true",
                   help="additionally eval each K with test.py "
                        "--memory_bank (the paper's few-shot protocol: "
                        "per-class support banks fused at --bank_weight) "
                        "and report both tables")
    p.add_argument("--bank_weight", type=float, default=0.5)
    # small-model passthroughs (CPU smoke: --model_name tiny-test
    # --img_size 70 --levels 1 2 --surgery_until_layer 2
    # --text_adapt_until 1 --image_adapt_until 1)
    p.add_argument("--levels", type=int, nargs="+", default=None)
    p.add_argument("--surgery_until_layer", type=int, default=None)
    p.add_argument("--text_adapt_until", type=int, default=None)
    p.add_argument("--image_adapt_until", type=int, default=None)
    p.add_argument("--num_workers", type=int, default=4)
    args = p.parse_args(argv)

    from aaclip_tpu.data.synthetic import make_synthetic_dataset

    if max(args.shots) > 12:
        raise SystemExit(
            f"--shots {args.shots}: the synthetic dataset has 12 images "
            f"per class, so K > 12 would silently truncate to the same "
            f"12-image support set while reporting a larger shot count")
    root = args.workdir or tempfile.mkdtemp(prefix="aaclip_fewshot_")
    data_root, meta_root = make_synthetic_dataset(
        root, img_px=args.img_size, n_normal=6, n_anomalous=6)
    os.environ["AACLIP_DATA"] = data_root
    os.environ["AACLIP_METADATA"] = meta_root
    print(f"synthetic dataset under {root}", flush=True)

    from tools.make_few_shot import main as make_few_shot
    make_few_shot(["--dataset", "MVTec", "--seed", "111",
                   "--include_anomalous",
                   "--shots"] + [str(k) for k in args.shots])

    import test as test_cli
    import train as train_cli

    common = [
        "--model_name", args.model_name, "--img_size", str(args.img_size),
        "--dataset", "MVTec", "--precision", args.precision,
    ]
    if args.levels is not None:
        common += ["--levels"] + [str(v) for v in args.levels]
    if args.text_adapt_until is not None:
        common += ["--text_adapt_until", str(args.text_adapt_until)]
    if args.image_adapt_until is not None:
        common += ["--image_adapt_until", str(args.image_adapt_until)]
    common += ["--num_workers", str(args.num_workers)]
    train_only = []  # flags train.py has but test.py doesn't
    if args.surgery_until_layer is not None:
        train_only += ["--surgery_until_layer", str(args.surgery_until_layer)]
    summary = []
    for k in args.shots:
        save = os.path.join(root, f"ckpt_{k}shot")
        t0 = time.time()
        train_cli.main(common + train_only + [
            "--save_path", save, "--training_mode", "few_shot",
            "--shot", str(k),
            "--text_epoch", str(args.text_epoch),
            "--image_epoch", str(args.image_epoch),
            "--text_batch_size", str(args.text_batch_size),
            "--image_batch_size", str(args.image_batch_size),
        ] + ([] if args.host_augment else ["--device_augment"]))
        t1 = time.time()
        test_cli.main(common + [
            "--save_path", save, "--shot", str(k),
            "--batch_size", str(args.eval_batch_size), "--aupro",
        ])
        t2 = time.time()
        row = last_average_row(os.path.join(save, "test.log"))
        if row is None:
            raise RuntimeError(
                f"{k}-shot: no 'Average' row in {save}/test.log — the eval "
                "did not produce a metric table; see the log above")
        line = (f"{k}-shot: train {t1 - t0:.0f}s eval {t2 - t1:.0f}s "
                f"pixel_auroc {row[0]:.2f} pixel_ap {row[1]:.2f} "
                f"image_auroc {row[2]:.2f} image_ap {row[3]:.2f} "
                f"aupro {row[4]:.2f}")
        print(line, flush=True)
        summary.append(line)
        if args.memory_bank:
            # separate save dir: test.py appends every run to test.log,
            # and last_average_row must not read the text-only table
            save_mb = os.path.join(root, f"ckpt_{k}shot_mb")
            os.makedirs(save_mb, exist_ok=True)
            import glob as _glob
            import shutil as _shutil
            for f in _glob.glob(os.path.join(save, "*.npz")):
                _shutil.copy(f, save_mb)  # image AND text adapters
            t3 = time.time()
            test_cli.main(common + [
                "--save_path", save_mb, "--shot", str(k),
                "--batch_size", str(args.eval_batch_size), "--aupro",
                "--memory_bank", "--bank_weight", str(args.bank_weight),
            ])
            t4 = time.time()
            row = last_average_row(os.path.join(save_mb, "test.log"))
            if row is None:
                raise RuntimeError(f"{k}-shot mb: no 'Average' row in "
                                   f"{save_mb}/test.log")
            line = (f"{k}-shot +memory_bank(w={args.bank_weight}): "
                    f"eval {t4 - t3:.0f}s "
                    f"pixel_auroc {row[0]:.2f} pixel_ap {row[1]:.2f} "
                    f"image_auroc {row[2]:.2f} image_ap {row[3]:.2f} "
                    f"aupro {row[4]:.2f}")
            print(line, flush=True)
            summary.append(line)

    print("\n=== few-shot soak summary ===")
    for line in summary:
        print(line)
    print("FEW-SHOT SOAK OK")


if __name__ == "__main__":
    main()

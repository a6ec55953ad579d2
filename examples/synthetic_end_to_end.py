"""Full two-stage training + evaluation on generated synthetic data.

The complete AA-CLIP workflow (reference scripts.sh: train then test)
with zero external assets: generates a tiny synthetic MVTec-style dataset
(aaclip_tpu.data.synthetic), trains the text-anchor stage and the
image-adapter stage with the reference CLI surface, then evaluates every
image-adapter snapshot and prints the per-class metrics table.

Runs in ~1 minute on CPU with the tiny test model:

    python examples/synthetic_end_to_end.py
    python examples/synthetic_end_to_end.py --workdir /tmp/aaclip_demo \
        --model_name tiny-test --img_size 70

With real datasets + the OpenAI checkpoint, the same flags (minus the
synthetic generation) reproduce the reference's experiments — see
README.md "Quick start".
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None,
                   help="where data + checkpoints go (default: a temp dir)")
    p.add_argument("--model_name", default="tiny-test",
                   help="tiny-test only: the demo hardcodes shallow-tower "
                        "adapter flags (levels 1 2, adapt_until 1, surgery "
                        "2) that would silently cripple a real backbone")
    p.add_argument("--img_size", type=int, default=70)
    p.add_argument("--epochs", type=int, default=2,
                   help="image-adapter epochs (each snapshot is evaluated)")
    args = p.parse_args(argv)
    if args.model_name != "tiny-test":
        raise SystemExit(
            "this zero-asset demo supports --model_name tiny-test only "
            "(its adapter/surgery flags assume the 3-layer tower); use "
            "train.py/test.py directly for real backbones")

    from aaclip_tpu.data.synthetic import make_synthetic_dataset

    root = args.workdir or tempfile.mkdtemp(prefix="aaclip_demo_")
    data_root, meta_root = make_synthetic_dataset(root, img_px=args.img_size)
    os.environ["AACLIP_DATA"] = data_root
    os.environ["AACLIP_METADATA"] = meta_root
    save = os.path.join(root, "ckpt")
    print(f"synthetic dataset + checkpoints under {root}")

    import test as test_cli
    import train as train_cli

    common = [
        "--model_name", args.model_name, "--img_size", str(args.img_size),
        "--dataset", "MVTec",
        "--text_adapt_until", "1", "--image_adapt_until", "1",
        "--levels", "1", "2",
        "--num_workers", "2",
    ]
    train_cli.main(common + [
        "--save_path", save, "--training_mode", "full_shot",
        "--text_epoch", "1", "--image_epoch", str(args.epochs),
        "--text_batch_size", "4", "--image_batch_size", "4",
        "--surgery_until_layer", "2",
    ])
    test_cli.main(common + ["--save_path", save, "--batch_size", "4",
                            "--aupro"])
    print(f"\ndone — metrics table in {save}/test.log")


if __name__ == "__main__":
    main()

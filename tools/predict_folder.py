"""Batch anomaly inference over a folder of images — no jsonl metadata.

The reference's test.py requires benchmark metadata; this is the
practitioner path: point at a directory of images, get per-image anomaly
scores (CSV) and optional heatmap PNGs.

Usage:
    python tools/predict_folder.py IMAGES_DIR --class_name bottle \
        [--dataset MVTec] [--save_path ckpt/run] [--out out_dir] \
        [--precision bf16] [--batch_size 8] [--heatmaps]

Writes {out}/scores.csv (file, image_score) and, with --heatmaps,
{out}/{name}_heatmap.png JET overlays.
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("images_dir")
    parser.add_argument("--class_name", required=True)
    parser.add_argument("--dataset", default="MVTec",
                        help="prompt registry to draw the class from")
    parser.add_argument("--model_name", default="ViT-L-14-336")
    parser.add_argument("--img_size", type=int, default=518)
    parser.add_argument("--save_path", default=None,
                        help="trained adapter dir (optional; zero-shot "
                             "with a warning when absent)")
    parser.add_argument("--out", default=None,
                        help="output dir (default: {images_dir}/aaclip_out)")
    parser.add_argument("--precision", default="bf16",
                        choices=["fp32", "fp32_high", "bf16"])
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--heatmaps", action="store_true")
    parser.add_argument("--levels", type=int, nargs="+", default=None)
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--artifact", default=None,
                        help="run a frozen jax.export artifact dir "
                             "(tools/export_artifact.py) — model/adapter/"
                             "precision flags are ignored; --dataset/"
                             "--class_name select among its anchors")
    args = parser.parse_args(argv)

    files = sorted(
        f for f in glob.glob(os.path.join(args.images_dir, "*"))
        if f.lower().endswith(IMG_EXTS))
    if not files:
        parser.error(f"no images under {args.images_dir}")
    out_dir = args.out or os.path.join(args.images_dir, "aaclip_out")
    os.makedirs(out_dir, exist_ok=True)

    from aaclip_tpu.utils.platform import honor_env_platform
    honor_env_platform()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from aaclip_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import create_clip_params, init_adapter_params
    from aaclip_tpu.data.registry import CLASS_NAMES, DOMAINS
    from aaclip_tpu.data.transforms import (load_image_rgb, load_rgb_chw,
                                            resize_image)
    from aaclip_tpu.eval.predict import make_anchor_encoder, make_predict_fn
    from aaclip_tpu.ops.similarity import fused_postproc_matrix
    from aaclip_tpu.text.anchors import encode_dataset_anchors

    if args.artifact:
        from aaclip_tpu.deploy import load_serving_artifact

        art = load_serving_artifact(args.artifact)
        args.img_size = art.img_size
        if args.dataset not in art.anchors:
            parser.error(f"dataset {args.dataset!r} not in artifact "
                         f"({sorted(art.anchors)})")
        if args.class_name not in art.anchors[args.dataset]:
            parser.error(
                f"class {args.class_name!r} not in artifact dataset "
                f"{args.dataset} ({sorted(art.anchors[args.dataset])})")
        if art.untrained:
            print("WARNING: artifact carries RANDOM-INIT adapters "
                  "(manifest.untrained=true) — scores are not anomaly "
                  "detections", file=sys.stderr)

        def predict_batch(imgs_np):
            return art.predict_class(imgs_np, args.dataset, args.class_name)
    else:
        if args.class_name not in CLASS_NAMES[args.dataset]:
            parser.error(f"class {args.class_name!r} not in {args.dataset} "
                         f"registry; have {CLASS_NAMES[args.dataset]}")

        policy = DtypePolicy.from_name(args.precision)
        cfg = get_config(args.model_name, args.img_size)
        kw = {"levels": tuple(args.levels)} if args.levels else {}
        acfg = AdapterConfig(**kw)
        # shallow towers (tiny/test configs): clamp the default adapt
        # depths to the tower — the trunk rejects deeper adapter stacks
        if acfg.image_adapt_until > cfg.vision.layers:
            kw["image_adapt_until"] = cfg.vision.layers
        if acfg.text_adapt_until > cfg.text.layers:
            kw["text_adapt_until"] = cfg.text.layers
        acfg = AdapterConfig(**kw)
        clip = create_clip_params(cfg, seed=args.seed, policy=policy)
        adapters = init_adapter_params(jax.random.PRNGKey(args.seed), cfg,
                                       acfg)

        image_adapter = adapters["image"]
        text_adapter = None
        if args.save_path:
            from aaclip_tpu.train import checkpoint as ckpt

            image_adapter, text_adapter, img_path, text_path = \
                ckpt.discover_serving_adapters(
                    args.save_path, adapters["image"], adapters["text"])
            if not text_path:  # keep the frozen text encoder, not a
                text_adapter = None  # random-init adapter template
            if not img_path:
                print("WARNING: no image adapter under --save_path; "
                      "running zero-shot with random adapters",
                      file=sys.stderr)
        else:
            print("WARNING: no --save_path; running zero-shot with random "
                  "adapters (scores are not anomaly detections)",
                  file=sys.stderr)

        from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn

        attn_fn = maybe_make_attn_fn(cfg, policy)
        predict = make_predict_fn(clip, cfg, acfg, img_size=args.img_size,
                                  policy=policy, attn_fn=attn_fn,
                                  uint8_inputs=True)
        enc = make_anchor_encoder(clip, cfg, acfg, text_adapter,
                                  policy=policy)
        anchors = jnp.asarray(
            encode_dataset_anchors(enc, args.dataset)[args.class_name])
        M = jnp.asarray(fused_postproc_matrix(cfg.vision.grid,
                                              args.img_size,
                                              DOMAINS[args.dataset]))

        def predict_batch(imgs_np):
            n = imgs_np.shape[0]
            if n < args.batch_size:  # pad to the compiled batch shape
                imgs_np = np.concatenate(
                    [imgs_np,
                     np.repeat(imgs_np[-1:], args.batch_size - n, axis=0)])
            pix, score = predict(image_adapter, jnp.asarray(imgs_np),
                                 anchors, M)
            return np.asarray(pix)[:n], np.asarray(score)[:n]

    rows = []
    B = args.batch_size
    for start in range(0, len(files), B):
        chunk = files[start:start + B]
        imgs = np.stack([
            load_rgb_chw(f, args.img_size, uint8=True) for f in chunk])
        pix, score = predict_batch(imgs)
        for f, s, m in zip(chunk, score, pix):
            rows.append((os.path.basename(f), float(s)))
            if args.heatmaps:
                from aaclip_tpu.eval.visualize import apply_scoremap
                from PIL import Image

                orig = np.asarray(resize_image(load_image_rgb(f),
                                               args.img_size))
                span = m.max() - m.min()
                norm = (m - m.min()) / span if span > 0 else m * 0
                panel = apply_scoremap(orig, (norm * 255).astype(np.uint8))
                name = os.path.splitext(os.path.basename(f))[0]
                Image.fromarray(panel).save(
                    os.path.join(out_dir, f"{name}_heatmap.png"))
        print(f"{start + len(chunk)}/{len(files)} images", file=sys.stderr)

    csv_path = os.path.join(out_dir, "scores.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file", "image_score"])
        w.writerows(rows)
    print(f"wrote {csv_path} ({len(rows)} rows)"
          + (f" + heatmaps under {out_dir}" if args.heatmaps else ""))


if __name__ == "__main__":
    main()

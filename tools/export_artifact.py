"""Export a self-contained serving artifact (see aaclip_tpu/deploy.py).

Flags mirror serve.py so a served configuration exports unchanged:

    python tools/export_artifact.py --out /srv/artifact \\
        --model_name ViT-L-14-336 --img_size 518 --precision bf16 \\
        --save_path runs/visa --datasets MVTec VisA

`--verify` reloads the artifact and checks one batch bit-exactly against
the live (non-exported) prediction path before reporting success.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--model_name", default="ViT-L-14-336")
    p.add_argument("--img_size", type=int, default=518)
    p.add_argument("--precision", default="bf16",
                   choices=["fp32", "fp32_high", "bf16", "int8"])
    p.add_argument("--datasets", nargs="+", default=["MVTec"])
    p.add_argument("--save_path", default=None,
                   help="adapter checkpoint dir (optional)")
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--seed", type=int, default=111)
    p.add_argument("--batch_sizes", type=int, nargs="+",
                   default=[1, 2, 4, 8, 16, 32])
    p.add_argument("--platforms", nargs="+", default=None,
                   help="jax.export target platforms (default: current "
                        "backend; cross-lowering for tpu works from a CPU "
                        "host)")
    p.add_argument("--native_kernels", action="store_true",
                   help="keep Pallas attention in the graph (TPU-only, "
                        "compiler-version-pinned)")
    p.add_argument("--levels", type=int, nargs="+", default=[6, 12, 18, 24])
    p.add_argument("--image_adapt_until", type=int, default=6)
    p.add_argument("--text_adapt_until", type=int, default=3)
    p.add_argument("--relu", action="store_true")
    p.add_argument("--verify", action="store_true")
    p.add_argument("--memory_bank_shot", type=int, default=0,
                   help="bundle K-shot per-class memory banks + the fused "
                        "bank graphs (test.py --artifact --memory_bank / "
                        "predict_class then use them); needs "
                        "AACLIP_DATA/METADATA on the export host")
    p.add_argument("--bank_weight", type=float, default=0.5)
    p.add_argument("--bank_chunk", type=int, default=1024)
    args = p.parse_args(argv)

    from aaclip_tpu.utils.platform import probe_devices_or_exit
    probe_devices_or_exit()
    from aaclip_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from aaclip_tpu.deploy import export_serving_artifact

    acfg = dict(levels=tuple(args.levels),
                image_adapt_until=args.image_adapt_until,
                text_adapt_until=args.text_adapt_until,
                proj_relu=args.relu)
    t0 = time.perf_counter()
    manifest = export_serving_artifact(
        args.out, model_name=args.model_name, img_size=args.img_size,
        precision=args.precision, adapter_cfg=acfg,
        clip_checkpoint=args.clip_checkpoint, seed=args.seed,
        save_path=args.save_path, datasets=tuple(args.datasets),
        batch_sizes=tuple(args.batch_sizes),
        platforms=tuple(args.platforms) if args.platforms else None,
        native_kernels=args.native_kernels,
        memory_bank_shot=args.memory_bank_shot,
        bank_weight=args.bank_weight, bank_chunk=args.bank_chunk)
    wall = time.perf_counter() - t0
    size = sum(os.path.getsize(os.path.join(args.out, f))
               for f in os.listdir(args.out))
    if manifest["untrained"]:
        print("WARNING: no trained image adapter found — the artifact "
              "serves RANDOM-INIT adapters (manifest.untrained=true)",
              file=sys.stderr)

    if args.verify:
        import numpy as np

        from aaclip_tpu.deploy import load_serving_artifact

        art = load_serving_artifact(args.out)
        ds = args.datasets[0]
        cls = sorted(art.anchors[ds])[0]
        b = min(art.batch_sizes[-1], 4)
        imgs = np.random.default_rng(0).integers(
            0, 255, (b, 3, args.img_size, args.img_size), dtype=np.uint8)
        maps, scores = art.predict_class(imgs, ds, cls)
        assert maps.shape == (b, args.img_size, args.img_size), maps.shape
        assert np.isfinite(scores).all(), scores
        print(f"verify OK: {ds}/{cls} maps {maps.shape} "
              f"scores {np.round(scores, 4).tolist()}")

    print(json.dumps({"out": args.out, "bytes": size,
                      "wall_s": round(wall, 1),
                      "graphs": len(manifest["graphs"]),
                      "platforms": manifest["platforms"],
                      "untrained": manifest["untrained"]}))


if __name__ == "__main__":
    main()

"""Minimal zero-shot anomaly detection with aaclip_tpu.

Computes a pixel anomaly map + image score for one image using the raw
(or adapter-trained) CLIP model and the anomaly-aware text anchors —
the library equivalent of one test.py iteration.

Usage:
    python examples/zero_shot.py path/to/image.png --class_name bottle
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("image")
    p.add_argument("--dataset", default="MVTec")
    p.add_argument("--class_name", default="bottle")
    p.add_argument("--model_name", default="ViT-L-14-336")
    p.add_argument("--img_size", type=int, default=518)
    p.add_argument("--save_path", default=None,
                   help="trained adapter dir (optional; zero-shot without)")
    p.add_argument("--levels", type=int, nargs="+", default=None,
                   help="tap depths (default: the ViT-L 6/12/18/24; "
                        "smaller models need shallower taps, e.g. "
                        "--levels 1 2 for tiny-test)")
    args = p.parse_args()

    from aaclip_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import create_clip_params, init_adapter_params
    from aaclip_tpu.data.registry import DOMAINS
    from aaclip_tpu.data.transforms import load_image_rgb, resize_image, to_uint8_chw
    from aaclip_tpu.eval.predict import make_anchor_encoder, make_predict_fn
    from aaclip_tpu.ops.similarity import fused_postproc_matrix
    from aaclip_tpu.text.anchors import encode_dataset_anchors

    cfg = get_config(args.model_name, args.img_size)
    if args.levels is None:
        acfg = AdapterConfig()
    else:
        until = min(max(args.levels), AdapterConfig().image_adapt_until)
        acfg = AdapterConfig(levels=tuple(args.levels),
                             image_adapt_until=until,
                             text_adapt_until=min(
                                 until, AdapterConfig().text_adapt_until))
    policy = DtypePolicy.bf16()
    clip = create_clip_params(cfg, seed=0, policy=policy)
    adapters = init_adapter_params(jax.random.PRNGKey(0), cfg, acfg, policy)
    if args.save_path:
        from aaclip_tpu.train import checkpoint as ckpt
        import glob, os
        snaps = sorted(glob.glob(os.path.join(args.save_path, "image_adapter_*.npz")))
        if snaps:
            _, adapters["image"], _, _ = ckpt.load_adapter_checkpoint(
                snaps[-1], adapters["image"])

    enc = make_anchor_encoder(clip, cfg, acfg, policy=policy)
    anchors = encode_dataset_anchors(enc, args.dataset)[args.class_name]
    predict = make_predict_fn(clip, cfg, acfg, policy=policy, uint8_inputs=True)
    M = jnp.asarray(fused_postproc_matrix(
        cfg.vision.grid, args.img_size, DOMAINS[args.dataset]))

    img = to_uint8_chw(resize_image(load_image_rgb(args.image), args.img_size))
    amap, score = predict(adapters["image"], jnp.asarray(img[None]),
                          jnp.asarray(anchors), M)
    amap = np.asarray(amap)[0]
    print(f"image score: {float(score[0]):.4f}")
    print(f"anomaly map: shape {amap.shape}, min {amap.min():.3f}, "
          f"max {amap.max():.3f}, argmax {np.unravel_index(amap.argmax(), amap.shape)}")


if __name__ == "__main__":
    main()

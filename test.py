"""Evaluation CLI.

Mirrors the reference's test.py (reference test.py:102-250): loads every
image-adapter checkpoint snapshot in the save path, rebuilds text anchors,
runs per-class batched predictions, and logs a pandas results table
(pixel/image AUROC + AP, plus AUPRO with --aupro) to {save_path}/test.log.

Checkpoints may be this framework's .npz or the reference's .pth files.
"""

from __future__ import annotations

import argparse
import glob
import os



def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Testing")
    # model (reference test.py:105-112)
    parser.add_argument("--model_name", type=str, default="ViT-L-14-336")
    parser.add_argument("--img_size", type=int, default=518)
    parser.add_argument("--relu", action="store_true")
    # testing (reference test.py:114-116)
    parser.add_argument("--dataset", type=str, default="MVTec")
    parser.add_argument("--shot", type=int, default=4)
    parser.add_argument("--batch_size", type=int, default=32)
    # exp (reference test.py:118-125)
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--save_path", type=str, default="ckpt/baseline")
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--text_norm_weight", type=float, default=0.1)
    parser.add_argument("--text_adapt_weight", type=float, default=0.1)
    parser.add_argument("--image_adapt_weight", type=float, default=0.1)
    parser.add_argument("--text_adapt_until", type=int, default=3)
    parser.add_argument("--image_adapt_until", type=int, default=6)
    # TPU-framework extras
    parser.add_argument("--levels", type=int, nargs="+", default=[6, 12, 18, 24])
    parser.add_argument("--precision", type=str, default="fp32",
                        choices=["fp32", "fp32_high", "bf16", "int8"],
                        help="fp32 = reference-exact (6-pass matmuls); "
                             "fp32_high = 3-pass fast-parity (~3e-5 rel); "
                             "bf16 = fast path; int8 = quantized trunk "
                             "matmuls on the int8 MXU (inference only)")
    parser.add_argument("--clip_checkpoint", type=str, default=None)
    parser.add_argument("--bf16_until", type=int, default=None,
                        help="override the staged-precision trunk depth "
                             "(leading vision blocks at single-pass bf16 "
                             "matmuls; fp32 residual stream; inference "
                             "only). Default: the precision's own setting")
    parser.add_argument("--int8_until", type=int, default=None,
                        help="with --precision int8: quantize only the "
                             "first K vision blocks, keep the rest bf16 "
                             "(mixed-prefix rescue of the image-metric "
                             "gate — the det token taps the LAST block). "
                             "Default 0 = whole trunk")
    parser.add_argument("--aupro", action="store_true",
                        help="also compute pixel AUPRO")
    parser.add_argument("--csv", action="store_true",
                        help="also write per-epoch results_<epoch>.csv "
                             "under save_path")
    parser.add_argument("--dump_scores", action="store_true",
                        help="also write per-image anomaly scores to "
                             "scores_<epoch>.csv under save_path (class, "
                             "file, label, image_score) — the raw ranking "
                             "data precision-fidelity A/Bs correlate")
    parser.add_argument("--fused_preprocess", action="store_true",
                        help="ship uint8 pixels; normalize on device inside "
                             "the patch-embed matmul (default with bf16)")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard eval batches over all local devices "
                             "(params/anchors replicated); per-sample results "
                             "are identical to single-device")
    parser.add_argument("--tensor_parallel", type=int, default=1,
                        help="model-parallel size: shard the frozen ViT "
                             "trunk Megatron-style over this many devices "
                             "(must divide device count and head count); "
                             "remaining devices form the data axis. "
                             "Results equal single-device within fp "
                             "tolerance (tests/test_tensor_parallel.py)")
    parser.add_argument("--sequence_parallel", action="store_true",
                        help="with --tensor_parallel N: also shard the "
                             "residual stream's sequence axis over the "
                             "model devices between matmul regions "
                             "(Megatron-SP; LayerNorms/residuals compute "
                             "S/N tokens per device)")
    parser.add_argument("--pipeline_parallel", type=int, default=1,
                        help="GPipe the trunk over this many devices "
                             "(stage boundaries on the tap levels, so it "
                             "must divide the level count; each device "
                             "holds layers/N blocks). Composes with "
                             "--data_parallel (remaining devices form "
                             "the data axis of a ('stage','data') mesh); "
                             "mutually exclusive with --tensor_parallel; "
                             "disables the staged-precision trunk and "
                             "fused uint8 preprocessing")
    parser.add_argument("--pp_microbatches", type=int, default=None,
                        help="microbatch count for --pipeline_parallel "
                             "(default = stage count; batch_size must "
                             "divide by it)")
    parser.add_argument("--memory_bank", action="store_true",
                        help="few-shot mode: build a per-class memory bank "
                             "of adapted patch features from --shot normal "
                             "TRAINING images (the reference's dead "
                             "get_support_features construction, reference "
                             "test.py:39-50) and fuse nearest-neighbor "
                             "bank scores with the text-anchor prediction "
                             "at --bank_weight (the scoring side is this "
                             "framework's documented extension — "
                             "eval/memory_bank.py)")
    parser.add_argument("--bank_weight", type=float, default=0.5,
                        help="fusion weight of the memory-bank scores "
                             "(0 = pure text anchors, 1 = pure bank)")
    parser.add_argument("--bank_chunk", type=int, default=1024,
                        help="bank-axis chunk of the max-similarity scan "
                             "(peak memory ~ [levels, B, L, chunk])")
    parser.add_argument("--artifact", type=str, default=None,
                        help="evaluate a frozen jax.export artifact dir "
                             "(tools/export_artifact.py) instead of "
                             "building the model: the exact graphs + "
                             "weights + anchors that serve.py --artifact "
                             "would run. Model/adapter/precision flags "
                             "are ignored; --dataset must be bundled in "
                             "the artifact. Single-device only")
    args = parser.parse_args(argv)
    if args.artifact and (args.data_parallel or args.tensor_parallel > 1
                          or args.sequence_parallel
                          or args.pipeline_parallel > 1):
        parser.error("--artifact serves frozen single-device graphs; "
                     "parallel flags need the live model path")
    if args.memory_bank and (args.tensor_parallel > 1
                             or args.pipeline_parallel > 1):
        parser.error("--memory_bank runs the live predictor (banks are "
                     "per-class, per-snapshot device arrays); it composes "
                     "with --data_parallel, and with --artifact when the "
                     "artifact bundles banks (export --memory_bank_shot)")
    if args.memory_bank and args.shot < 1 and not args.artifact:
        parser.error("--memory_bank needs --shot >= 1 support images "
                     "(artifact banks carry their own shot count)")
    # the artifact-bank mismatch warning must fire only on an EXPLICIT
    # --shot (the default 4 is a reference-CLI-contract value, not a
    # user intent)
    import sys as _sys
    args.shot_explicit = "--shot" in (argv if argv is not None
                                      else _sys.argv[1:])
    return args


def main(argv=None):
    args = parse_args(argv)

    from aaclip_tpu.utils.seed import setup_seed
    setup_seed(args.seed)
    os.makedirs(args.save_path, exist_ok=True)
    from aaclip_tpu.utils.logging import setup_logger
    logger = setup_logger("aaclip.test", os.path.join(args.save_path, "test.log"))
    logger.info("args: %s", vars(args))

    from aaclip_tpu.utils.platform import (honor_env_platform,
                                           probe_devices_or_exit)
    honor_env_platform()
    probe_devices_or_exit()  # dead TPU relay: fast exit, not a silent hang
    import jax
    from pandas import DataFrame, Series

    from aaclip_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import create_clip_params, init_adapter_params
    from aaclip_tpu.data.datasets import BatchLoader, get_test_datasets
    from aaclip_tpu.data.registry import DOMAINS
    from aaclip_tpu.eval.metrics import metrics_eval
    from aaclip_tpu.eval.predict import (
        make_anchor_encoder, make_predict_fn, run_class_predictions)
    from aaclip_tpu.eval.visualize import visualize
    from aaclip_tpu.text.anchors import encode_dataset_anchors
    from aaclip_tpu.train import checkpoint as ckpt
    from aaclip_tpu.utils.profiling import StepTimer

    mb_ctx = None  # set by the live path when --memory_bank is on

    def _eval_one(predict_fn, image_adapter, label):
        """One results table (the reference's per-snapshot block,
        test.py:179-250); reads image_datasets / text_embeddings / domain
        (and mb_ctx) from the enclosing scope — both the live and the
        artifact path assign them before calling."""
        logger.info("-----------------------------------------------")
        logger.info("load model from epoch %s", label)
        logger.info("-----------------------------------------------")

        columns = ["class name", "pixel AUC", "pixel AP", "image AUC",
                   "image AP"]
        if args.aupro:
            columns.append("pixel AUPRO")
        df = DataFrame(columns=columns)
        score_rows = []  # --dump_scores accumulator
        timer = StepTimer()
        for class_name, dataset in image_datasets.items():
            # per-class size logging (reference dataset/__init__.py:145-148)
            logger.info("Class name: %s", class_name)
            logger.info("Sample number: %d", len(dataset))
            logger.info("=====================================")
            if len(dataset) == 0:
                logger.info("skipping empty class %s", class_name)
                continue
            loader = BatchLoader(dataset, args.batch_size, shuffle=False,
                                 num_workers=args.num_workers)
            fn = predict_fn
            if getattr(predict_fn, "per_class", None) is not None:
                # artifact-bank path: banks are frozen per class in the
                # artifact, so the per-class hook swaps in the right one
                fn = predict_fn.per_class(class_name)
            if mb_ctx is not None and class_name not in mb_ctx["support"]:
                # test records exist but the train metadata has no rows
                # for this class — bank-less fallback would silently mix
                # protocols across classes; fail loudly instead
                raise SystemExit(
                    f"--memory_bank: class {class_name!r} has test images "
                    "but no training metadata to draw support from")
            if mb_ctx is not None:
                # per-snapshot, per-class: the bank is built from the
                # adapters under evaluation (reference test.py:41 comment —
                # train first, then construct the bank from that model)
                from aaclip_tpu.eval.memory_bank import collect_bank
                bank = collect_bank(
                    mb_ctx["predict"].features_fn, image_adapter,
                    mb_ctx["support"][class_name],
                    batch_size=args.batch_size)
                logger.info("memory bank: %d patch vectors/level x %d "
                            "levels (%d-shot)", bank.shape[1], bank.shape[0],
                            args.shot)

                def fn(ia, im, an, M, _bank=bank):
                    return mb_ctx["predict"](ia, im, an, M, _bank)
                # run_class_predictions keys its input placement off the
                # predictor's mesh attribute (dp: batch sharded, rest
                # replicated); the closure must carry it through
                fn.mesh = mb_ctx["predict"].mesh
            masks, labels, preds, preds_image, file_names = \
                run_class_predictions(
                    fn, image_adapter, loader,
                    text_embeddings[class_name], domain,
                    args.img_size, grid)
            timer.tick(len(file_names))
            if args.dump_scores:
                for fn, lab, sc in zip(file_names, labels, preds_image):
                    score_rows.append((class_name, fn, int(lab), float(sc)))
            if args.visualize:
                visualize(masks, preds, file_names, args.save_path,
                          args.dataset, class_name)
            row = metrics_eval(masks, labels, preds, preds_image, class_name,
                               domain, compute_aupro=args.aupro)
            df.loc[len(df)] = Series(row)
        if timer.rate():
            # rate excludes the first class (its window absorbs compiles)
            logger.info("eval throughput: %.2f maps/s", timer.rate())
        for col in df.columns:
            if col != "class name":
                df[col] = df[col].astype(float)
        df.loc[len(df)] = df.mean(numeric_only=True)
        df.loc[len(df) - 1, "class name"] = "Average"
        logger.info("final results:\n%s",
                    df.to_string(index=False, justify="center"))
        print(df.to_string(index=False, justify="center"))
        if args.csv:
            csv_path = os.path.join(args.save_path, f"results_{label}.csv")
            df.to_csv(csv_path, index=False)
            logger.info("wrote %s", csv_path)
        if args.dump_scores:
            sdf = DataFrame(score_rows, columns=["class name", "file",
                                                 "label", "image_score"])
            spath = os.path.join(args.save_path, f"scores_{label}.csv")
            sdf.to_csv(spath, index=False)
            logger.info("wrote %s", spath)

    if args.artifact:
        # evaluate the exact frozen bytes that serve.py --artifact runs:
        # graphs + prepared weights + anchors all come from the artifact,
        # so this is the deployment-gate check, not a rebuild
        import numpy as np

        from aaclip_tpu.deploy import load_serving_artifact

        art = load_serving_artifact(args.artifact)
        if args.dataset not in art.anchors:
            raise SystemExit(
                f"dataset {args.dataset!r} not in artifact "
                f"({sorted(art.anchors)}) — re-export with --datasets")
        if art.untrained:
            logger.warning(
                "artifact %s carries RANDOM-INIT adapters "
                "(manifest.untrained=true) — metrics are not anomaly "
                "detection results", args.artifact)
        args.img_size = art.img_size  # datasets must feed artifact shapes
        grid = int(art.manifest["grid"])
        logger.info("artifact manifest: model %s @ %dpx, precision %s, "
                    "adapters %s", art.manifest["model_name"], art.img_size,
                    art.manifest["precision"],
                    art.manifest["image_adapter_ckpt"] or "random-init")
        domain = DOMAINS[args.dataset]
        image_datasets = get_test_datasets(args.dataset, args.img_size,
                                           uint8=True)
        text_embeddings = art.anchors[args.dataset]

        def predict_fn(image_adapter, imgs, anchors, M):
            # the artifact's graphs bundle their own postproc matrix; the
            # M built by run_class_predictions is unused by construction
            del image_adapter, M
            imgs = np.asarray(imgs)
            anc = np.broadcast_to(np.asarray(anchors, np.float32),
                                  (imgs.shape[0],) + np.shape(anchors))
            return art.predict(imgs, anc, args.dataset)

        # the artifact does its own device placement — staging inputs on
        # device in run_class_predictions would add a wasted host->device->
        # host round trip per batch (minutes over a full eval on the relay)
        predict_fn.host_inputs = True
        if args.memory_bank:
            ds_banks = getattr(art, "banks", {}).get(args.dataset, {})
            if not ds_banks:
                raise SystemExit(
                    "--memory_bank with --artifact needs banks bundled at "
                    "export (tools/export_artifact.py --memory_bank_shot "
                    "K) — this artifact has none for "
                    f"{args.dataset!r}")
            logger.info("artifact memory bank: %d-shot, weight %.2f, "
                        "%d classes banked", art.shot, art.bank_weight,
                        len(ds_banks))
            # the shot count and fusion weight are BAKED into the
            # exported bank graphs — a differing CLI value would be
            # silently ignored (sweeping --bank_weight over an artifact
            # produces identical tables)
            if abs(args.bank_weight - art.bank_weight) > 1e-9:
                logger.warning(
                    "--bank_weight %.2f has no effect on an artifact "
                    "(weight %.2f was baked at export; re-export to "
                    "change it)", args.bank_weight, art.bank_weight)
            if args.shot_explicit and args.shot != art.shot:
                logger.warning(
                    "--shot %d has no effect on an artifact (banks were "
                    "built %d-shot at export)", args.shot, art.shot)

            def per_class(cls):
                if cls not in ds_banks:
                    raise SystemExit(
                        f"--memory_bank: class {cls!r} has test images "
                        "but no bank in the artifact — re-export")

                def fn(image_adapter, imgs, anchors, M):
                    del image_adapter, anchors, M
                    return art.predict_class(np.asarray(imgs),
                                             args.dataset, cls,
                                             use_bank=True)
                fn.host_inputs = True
                return fn
            predict_fn.per_class = per_class
        _eval_one(predict_fn, None, "artifact")
        return

    policy = DtypePolicy.from_name(args.precision)
    if args.bf16_until is not None:
        import dataclasses
        policy = dataclasses.replace(policy, bf16_until=args.bf16_until)
    if args.int8_until is not None:
        import dataclasses
        if args.precision != "int8":
            raise SystemExit("--int8_until requires --precision int8")
        policy = dataclasses.replace(policy, int8_until=args.int8_until)
    cfg = get_config(args.model_name, args.img_size)
    acfg = AdapterConfig(
        text_adapt_weight=args.text_adapt_weight,
        image_adapt_weight=args.image_adapt_weight,
        text_adapt_until=args.text_adapt_until,
        image_adapt_until=args.image_adapt_until,
        levels=tuple(args.levels),
        proj_relu=args.relu,
    )
    clip_params = create_clip_params(
        cfg, checkpoint=args.clip_checkpoint, seed=args.seed, policy=policy)
    adapters = init_adapter_params(jax.random.PRNGKey(args.seed), cfg, acfg)

    # ---- text adapter (reference test.py:163-170) -------------------------
    text_adapter = None
    npz = ckpt.find_adapter_checkpoint(
        os.path.join(args.save_path, "text_adapter.npz"))
    pths = glob.glob(os.path.join(args.save_path, "text_adapter.pth"))
    if npz:
        _, text_adapter, _, _ = ckpt.load_adapter_checkpoint_any(
            npz, adapters["text"])
    elif pths:
        _, text_adapter = ckpt.load_reference_checkpoint(
            pths[0], "text", n_adapt=args.text_adapt_until)

    # ---- image adapter snapshots (reference test.py:172-177) -------------
    def _snap_epoch(path):
        # snapshots are image_adapter_{epoch}.{ext} with NO zero padding:
        # lexicographic order puts 10 before 2, so 10+-epoch runs would
        # log epoch 9's table LAST (tools read the final table as "the
        # final epoch") — sort by parsed epoch within each format
        import re
        m = re.search(r"image_adapter_(\d+)\.\w+$", path)
        return int(m.group(1)) if m else -1

    files = sorted(glob.glob(os.path.join(args.save_path, "image_adapter_*.npz")),
                   key=_snap_epoch)
    files += sorted(glob.glob(os.path.join(args.save_path, "image_adapter_*.orbax")),
                    key=_snap_epoch)
    files += sorted(glob.glob(os.path.join(args.save_path, "image_adapter_*.pth")),
                    key=_snap_epoch)
    if not files:  # not an assert: python -O would silently skip the loop
        raise SystemExit(
            f"image adapter checkpoint not found under {args.save_path!r}")

    from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn
    attn_fn = maybe_make_attn_fn(cfg, policy)
    uint8_inputs = (args.fused_preprocess
                    or args.precision in ("bf16", "int8"))
    mesh = None
    if args.pipeline_parallel > 1:
        if args.tensor_parallel > 1:
            raise SystemExit("--pipeline_parallel is mutually exclusive "
                             "with --tensor_parallel")
        if args.sequence_parallel:
            raise SystemExit("--sequence_parallel requires "
                             "--tensor_parallel and does not compose with "
                             "--pipeline_parallel")
        import dataclasses as _dc
        if policy.bf16_until:
            policy = _dc.replace(policy, bf16_until=0)
            logger.info("pipeline_parallel: staged-precision trunk disabled")
        uint8_inputs = False  # pipeline embeds normalized float pixels
        from aaclip_tpu.parallel.pipeline import make_pipeline_predict_fn
        import jax as _jax
        if args.pipeline_parallel > len(_jax.devices()):
            raise SystemExit(
                f"--pipeline_parallel {args.pipeline_parallel} exceeds the "
                f"{len(_jax.devices())} available devices")
        pp_dp = (len(_jax.devices()) // args.pipeline_parallel
                 if args.data_parallel else 1)
        predict_fn = make_pipeline_predict_fn(
            clip_params, cfg, acfg, pp=args.pipeline_parallel,
            n_micro=args.pp_microbatches, dp=pp_dp, img_size=args.img_size,
            policy=policy, attn_fn=maybe_make_attn_fn(cfg, policy))
        n_micro = predict_fn.n_micro
        chunk = n_micro * pp_dp
        if args.batch_size % chunk:
            args.batch_size = ((args.batch_size + chunk - 1)
                               // chunk) * chunk
            logger.info("pipeline_parallel: batch_size rounded up to %d "
                        "(%d microbatches x dp=%d)", args.batch_size,
                        n_micro, pp_dp)
        logger.info("mesh: stage=%d x data=%d (GPipe, %d microbatches)",
                    args.pipeline_parallel, pp_dp, n_micro)
    elif args.data_parallel or args.tensor_parallel > 1:
        from aaclip_tpu.parallel import sharding as sh
        sh.initialize_multihost()
        if args.tensor_parallel > 1:
            from aaclip_tpu.parallel import tensor as tpar
            mesh = tpar.make_mesh_2d(args.tensor_parallel)
            n_dev = dict(mesh.shape)["data"]
            logger.info("mesh: data=%d x model=%d", n_dev,
                        args.tensor_parallel)
        else:
            mesh = sh.make_data_mesh()
            n_dev = mesh.devices.size
        if args.batch_size % n_dev:
            args.batch_size = ((args.batch_size + n_dev - 1) // n_dev) * n_dev
            logger.info("data_parallel: batch_size rounded up to %d "
                        "(%d-way data axis)", args.batch_size, n_dev)
    if args.pipeline_parallel <= 1:
        predict_fn = make_predict_fn(clip_params, cfg, acfg,
                                     img_size=args.img_size, policy=policy,
                                     attn_fn=attn_fn,
                                     uint8_inputs=uint8_inputs, mesh=mesh,
                                     sequence_parallel=args.sequence_parallel)
    if args.memory_bank:
        from aaclip_tpu.eval import memory_bank as mb

        mb_predict = mb.make_mb_predict_fn(
            clip_params, cfg, acfg, img_size=args.img_size, policy=policy,
            attn_fn=attn_fn, uint8_inputs=uint8_inputs,
            bank_weight=args.bank_weight, chunk=args.bank_chunk,
            mesh=mesh)  # 1-D data mesh under --data_parallel, else None
        # the ONE support-draw definition, shared with the artifact
        # exporter (classes absent from the metadata are skipped; their
        # test splits are empty too and _eval_one skips them)
        support = mb.collect_support_sets(args.dataset, args.shot,
                                          args.img_size,
                                          uint8=uint8_inputs, log=logger)
        mb_ctx = {"predict": mb_predict, "support": support}
        logger.info("memory_bank: fusing %d-shot nearest-neighbor scores "
                    "at weight %.2f", args.shot, args.bank_weight)
    domain = DOMAINS[args.dataset]

    # loop-invariant across image-adapter snapshots: the datasets and the
    # text anchors depend only on the (fixed) text adapter — re-encoding
    # all classes' prompts per snapshot is a real text-tower forward per
    # iteration on the TPU
    image_datasets = get_test_datasets(args.dataset, args.img_size,
                                       uint8=uint8_inputs)
    enc = make_anchor_encoder(clip_params, cfg, acfg, text_adapter,
                              policy=policy)
    text_embeddings = encode_dataset_anchors(enc, args.dataset)

    grid = cfg.vision.grid
    for file in files:
        if file.endswith(".npz") or file.endswith(".orbax"):
            test_epoch, image_adapter, _, _ = ckpt.load_adapter_checkpoint_any(
                file, adapters["image"])
        else:
            test_epoch, image_adapter = ckpt.load_reference_checkpoint(
                file, "image", n_adapt=args.image_adapt_until,
                n_levels=len(args.levels))
        image_adapter = jax.tree.map(jax.numpy.asarray, image_adapter)
        _eval_one(predict_fn, image_adapter, test_epoch)


if __name__ == "__main__":
    main()

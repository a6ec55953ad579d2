"""Two-stage adapter training CLI.

Mirrors the reference's train.py flag surface and behavior (reference
train.py:177-357): stage 1 trains the text adapters against surgery-CLIP
patch features, stage 2 freezes the anchors and trains the image adapters.
TPU-first internals: jitted update steps, batched anchor encoding, optional
data parallelism over a device mesh, npz checkpoints (plus .pth interop).

Extra flags beyond the reference: --precision {fp32,bf16}, --clip_checkpoint,
--model_name tiny-test (for smoke runs), --num_workers, --data_parallel,
--levels.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Training")
    # model (reference train.py:180-188)
    parser.add_argument("--model_name", type=str, default="ViT-L-14-336")
    parser.add_argument("--img_size", type=int, default=518)
    parser.add_argument("--surgery_until_layer", type=int, default=20)
    parser.add_argument("--relu", action="store_true",
                        help="use relu after projection")
    # training (reference train.py:190-206)
    parser.add_argument("--dataset", type=str, default="VisA")
    parser.add_argument("--training_mode", type=str, default="few_shot",
                        choices=["few_shot", "full_shot"])
    parser.add_argument("--shot", type=int, default=32)
    parser.add_argument("--text_batch_size", type=int, default=16)
    parser.add_argument("--image_batch_size", type=int, default=2)
    parser.add_argument("--text_epoch", type=int, default=5)
    parser.add_argument("--image_epoch", type=int, default=20)
    parser.add_argument("--text_lr", type=float, default=0.00001)
    parser.add_argument("--image_lr", type=float, default=0.0005)
    parser.add_argument("--criterion", type=str, nargs="+",
                        default=["dice_loss", "focal_loss"],
                        help="accepted for reference-CLI compatibility but "
                             "IGNORED, exactly like the reference (its "
                             "train.py never reads args.criterion; the loss "
                             "is hard-wired focal+dice)")
    # exp (reference train.py:208-209)
    parser.add_argument("--seed", type=int, default=111)
    parser.add_argument("--save_path", type=str, default="ckpt/baseline")
    # hyper-parameters (reference train.py:211-215)
    parser.add_argument("--text_norm_weight", type=float, default=0.1)
    parser.add_argument("--text_adapt_weight", type=float, default=0.1)
    parser.add_argument("--image_adapt_weight", type=float, default=0.1)
    parser.add_argument("--text_adapt_until", type=int, default=3)
    parser.add_argument("--image_adapt_until", type=int, default=6)
    # TPU-framework extras
    parser.add_argument("--levels", type=int, nargs="+", default=[6, 12, 18, 24])
    parser.add_argument("--precision", type=str, default="fp32",
                        choices=["fp32", "fp32_high", "bf16"],
                        help="fp32 = reference-exact (6-pass matmuls); "
                             "fp32_high = 3-pass fast-parity (~3e-5 rel); "
                             "bf16 = fast path")
    parser.add_argument("--clip_checkpoint", type=str, default=None)
    parser.add_argument("--require_pretrained", action="store_true")
    parser.add_argument("--ckpt_backend", type=str, default="npz",
                        choices=["npz", "orbax"],
                        help="npz = single-file flat archive (default); "
                             "orbax = async, multi-host-safe directory "
                             "checkpoints")
    parser.add_argument("--device_augment", action="store_true",
                        help="apply the joint geometric augmentation on "
                             "device (jax.random, whole batch at once) "
                             "instead of per-sample on the host; same "
                             "transform distribution, different RNG stream")
    parser.add_argument("--vv_mode", type=str, default="batch",
                        choices=["batch", "spatial"],
                        help="stage-1 surgery V-V attention semantics. "
                             "'batch' is reference-exact: the reference's "
                             "surgery Attention treats the seq-first stream "
                             "as batch-first, so V-V attention runs ACROSS "
                             "the batch at each position and supervision "
                             "features depend on batch composition "
                             "(docs/PARITY.md). 'spatial' is the intended "
                             "per-sample CLIP-Surgery form (batch-"
                             "independent, Pallas-accelerated).")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard batches over all local devices")
    parser.add_argument("--tensor_parallel", type=int, default=1,
                        help="model-parallel size: Megatron-shard the frozen "
                             "ViT trunk over this many devices for stage-2 "
                             "training (forward and backward; must divide "
                             "device count and head count); remaining "
                             "devices form the data axis. Stage 1 runs "
                             "data-parallel over the data axis (the text "
                             "tower is small; the model axis replicates it)")
    parser.add_argument("--sequence_parallel", action="store_true",
                        help="with --tensor_parallel N: also shard the "
                             "residual stream's sequence axis over the "
                             "model devices between matmul regions "
                             "(Megatron-SP — under remat the saved "
                             "residuals shrink to S/N tokens per device)")
    parser.add_argument("--pipeline_parallel", type=int, default=1,
                        help="GPipe stage-2 training over this many devices "
                             "(parallel/pipeline.py): the trunk's blocks "
                             "live layers/N per device on a ('stage',) "
                             "ring, microbatches stream through via "
                             "ppermute, and the backward counter-streams "
                             "through the transpose. Must divide the "
                             "level count. Composes with --data_parallel "
                             "(remaining devices form the data axis; "
                             "loss numerators/valid counts psum over it); "
                             "mutually exclusive with --tensor_parallel. "
                             "Stage 1 pipelines the surgery-feature trunk "
                             "the same way (batch-mode V-V then couples "
                             "per MICROBATCH — docs/PARITY.md; the text "
                             "tower update stays unsharded). Stage-2 "
                             "update semantics == --grad_accum "
                             "<microbatches>")
    parser.add_argument("--pp_microbatches", type=int, default=None,
                        help="microbatch count for --pipeline_parallel "
                             "(default = stage count; image_batch_size "
                             "must divide by it)")
    parser.add_argument("--cache_device", action="store_true",
                        help="with --device_augment: upload the raw uint8 "
                             "dataset to device memory ONCE and assemble "
                             "batches on device (gather + color jitter + "
                             "normalize + geometric augment in one jitted "
                             "program) — steady-state epochs move only "
                             "[B] index vectors over the host link. "
                             "Fits when n_images*(3+1)*img_size^2 bytes "
                             "spare HBM; single-host, no tensor/pipeline "
                             "parallelism")
    parser.add_argument("--fused_assemble", action="store_true",
                        help="with --cache_device: fold batch k+1's "
                             "on-device assembly (gather + jitter + "
                             "normalize + geometric augment) into step "
                             "k's jitted program, so the TPU scheduler "
                             "can hide the assembly's DMA-heavy gathers "
                             "inside the step's MXU-bound regions instead "
                             "of running the two programs back-to-back. "
                             "Stage 2 only; identical numerics "
                             "(tests/test_device_cache.py)")
    parser.add_argument("--loss_fetch_every", type=int, default=8,
                        help="block on a loss scalar only every K steps "
                             "(the rest are async-copied and drained at "
                             "epoch end). Each float(loss) through the "
                             "axon relay is a full round trip — per-step "
                             "fetching serializes the host loop on the "
                             "device. K bounds in-flight input batches "
                             "to ~2K (first block lands at step 2K, and "
                             "the confirmed watermark lags up to 2K "
                             "steps); 1 recovers the old per-step fetch")
    parser.add_argument("--profile_input", action="store_true",
                        help="log a per-epoch host-loop phase "
                             "decomposition (loader wait / H2D / augment "
                             "/ step dispatch / loss fetch) — names where "
                             "the CLI-wall vs device-step gap goes")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="split each stage-2 batch into this many "
                             "microbatches inside the jitted step, "
                             "accumulating gradients (peak activation "
                             "memory drops to a batch/K forward+backward; "
                             "the applied update is the microbatch-mean "
                             "gradient — equal to the big-batch gradient "
                             "for full batches). image_batch_size must be "
                             "divisible by it")
    parser.add_argument("--feature_chunk", type=int, default=0,
                        help="stage 1: extract surgery features this many "
                             "images at a time (exact with --vv_mode "
                             "spatial; rejected in batch mode, whose "
                             "features are batch-coupled). Lets "
                             "text_batch_size grow past the whole-batch "
                             "feature HBM wall, amortizing the per-step "
                             "text-tower backward over more images")
    parser.add_argument("--remat", type=str, default="auto",
                        choices=["auto", "full", "selective", "off"],
                        help="stage-2 rematerialization. 'selective' saves "
                             "the per-block attn/qkv/mlp matmul outputs so "
                             "the backward skips recompute (~35%% faster, "
                             "+4.4GB HBM at batch 8; needs the Pallas "
                             "custom-VJP attention). 'auto' = selective "
                             "when that kernel is active, else full. 'off' "
                             "OOMs at production shapes with XLA attention.")
    args = parser.parse_args(argv)
    if args.fused_assemble and not args.cache_device:
        parser.error("--fused_assemble requires --cache_device (it folds "
                     "the device-cache batch assembly into the stage-2 "
                     "step program)")
    if args.cache_device and not args.device_augment:
        parser.error("--cache_device requires --device_augment (batch "
                     "assembly, jitter and augmentation all run on device)")
    if args.cache_device and (args.tensor_parallel > 1
                              or args.pipeline_parallel > 1
                              or args.data_parallel):
        parser.error("--cache_device assembles single-device batches; it "
                     "does not compose with data/tensor/pipeline "
                     "parallelism")
    return args


def main(argv=None):
    args = parse_args(argv)

    from aaclip_tpu.utils.seed import setup_seed
    setup_seed(args.seed)
    os.makedirs(args.save_path, exist_ok=True)
    from aaclip_tpu.utils.logging import setup_logger
    logger = setup_logger("aaclip.train", os.path.join(args.save_path, "train.log"))
    logger.info("args: %s", vars(args))

    from aaclip_tpu.utils.platform import (honor_env_platform,
                                           probe_devices_or_exit)
    honor_env_platform()
    probe_devices_or_exit()  # dead TPU relay: fast exit, not a silent hang
    import jax
    import jax.numpy as jnp

    from aaclip_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import create_clip_params, init_adapter_params
    from aaclip_tpu.data.datasets import BatchLoader, get_train_datasets
    from aaclip_tpu.data.registry import CLASS_NAMES
    from aaclip_tpu.eval.predict import make_anchor_encoder
    from aaclip_tpu.parallel import sharding as sh
    from aaclip_tpu.text.anchors import dataset_prompt_tokens, encode_dataset_anchors
    from aaclip_tpu.train import checkpoint as ckpt
    from aaclip_tpu.train.optim import make_image_optimizer, make_text_optimizer
    from aaclip_tpu.train.steps import (
        TrainState, init_state, make_stage1_step, make_stage2_step,
        stage1_features_fn)
    from aaclip_tpu.utils.profiling import (HostLoopProfiler, StepTimer,
                                            ThrottledLossDrain)

    sh.initialize_multihost()
    host_id, num_hosts = jax.process_index(), jax.process_count()
    policy = DtypePolicy.from_name(args.precision)
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
        cfg, checkpoint=args.clip_checkpoint, seed=args.seed,
        require_pretrained=args.require_pretrained, policy=policy)
    if args.clip_checkpoint is None:
        from aaclip_tpu.core.params import find_default_checkpoint
        if find_default_checkpoint() is None:
            logger.warning("no CLIP checkpoint found — using RANDOM weights "
                           "(smoke/benchmark mode only)")
    adapters = init_adapter_params(jax.random.PRNGKey(args.seed), cfg, acfg)

    class_names = CLASS_NAMES[args.dataset]
    cls_to_idx = {c: i for i, c in enumerate(class_names)}
    prompt_tokens = dataset_prompt_tokens(args.dataset)

    if args.training_mode == "full_shot":
        args.shot = -1
    logger.info("loading dataset ...")
    text_ds, image_ds = get_train_datasets(
        args.dataset, args.img_size, args.shot, seed=args.seed,
        device_augment=args.device_augment)
    aug_fn = None
    if args.device_augment:
        from aaclip_tpu.ops.augment import make_device_augment
        # datasets emit uint8 in this mode; normalization fuses into the
        # device augmentation step (4x less relay/PCIe traffic)
        aug_fn = make_device_augment(uint8_inputs=True)
        aug_base = jax.random.PRNGKey(args.seed ^ 0x5EED)

    def maybe_augment(images, mask, stage, epoch, it):
        if aug_fn is None:
            return images, mask
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.fold_in(aug_base, stage), epoch), it)
        return aug_fn(key, images, mask)

    text_tx = make_text_optimizer(args.text_lr)
    image_tx = make_image_optimizer(args.image_lr)

    # ---- checkpoint resume (reference train.py:276-296 semantics) --------
    text_state = init_state(adapters["text"], text_tx)
    text_start_epoch = 0
    adapt_text = args.text_epoch != 0
    text_ckpt = os.path.join(args.save_path, "text_adapter.npz")
    found = ckpt.find_adapter_checkpoint(text_ckpt)
    if found:
        epoch, adapter, opt_state, step = ckpt.load_adapter_checkpoint_any(
            found, adapters["text"], text_state.opt_state)
        text_state = TrainState(adapter, opt_state or text_state.opt_state,
                                jnp.asarray(step, jnp.int32))
        text_start_epoch = epoch
        adapt_text = not (epoch == (args.text_epoch - 1))

    image_state = init_state(adapters["image"], image_tx)
    image_start_epoch = 0
    image_ckpt = os.path.join(args.save_path, "image_adapter.npz")
    found = ckpt.find_adapter_checkpoint(image_ckpt)
    if found:
        epoch, adapter, opt_state, step = ckpt.load_adapter_checkpoint_any(
            found, adapters["image"], image_state.opt_state)
        image_state = TrainState(adapter, opt_state or image_state.opt_state,
                                 jnp.asarray(step, jnp.int32))
        image_start_epoch = epoch

    mesh = None
    n_dev = 1
    pp_dp = 1
    if args.pipeline_parallel > 1 and args.tensor_parallel > 1:
        raise SystemExit("--pipeline_parallel is mutually exclusive with "
                         "--tensor_parallel")
    if args.pipeline_parallel > 1 and args.sequence_parallel:
        raise SystemExit("--sequence_parallel requires --tensor_parallel "
                         "and does not compose with --pipeline_parallel")
    if args.pipeline_parallel > 1:
        if args.pipeline_parallel > len(jax.devices()):
            raise SystemExit(
                f"--pipeline_parallel {args.pipeline_parallel} exceeds the "
                f"{len(jax.devices())} available devices")
        if args.grad_accum > 1:
            raise SystemExit(
                "--grad_accum does not compose with --pipeline_parallel "
                "(the GPipe schedule already microbatches; raise "
                "--pp_microbatches instead)")
        if args.remat == "selective":
            raise SystemExit(
                "--remat selective is not supported with "
                "--pipeline_parallel (the pipeline trainer supports "
                "full/off only)")
        # pp composes with --data_parallel on a ('stage','data') mesh for
        # stage 2; stage 1 (text) runs unsharded either way
        pp_dp = (len(jax.devices()) // args.pipeline_parallel
                 if args.data_parallel else 1)
        n_micro = args.pp_microbatches or args.pipeline_parallel
        chunk = n_micro * pp_dp
        if args.image_batch_size % chunk:
            args.image_batch_size = ((args.image_batch_size + chunk - 1)
                                     // chunk) * chunk
            logger.info("pipeline_parallel: image_batch_size rounded up "
                        "to %d (%d microbatches x dp=%d)",
                        args.image_batch_size, n_micro, pp_dp)
        # stage-1 PP: batch-coupled V-V rejects data sharding (the
        # features fn raises), so its dp is spatial-only
        s1_pp_dp = pp_dp if args.vv_mode == "spatial" else 1
        s1_chunk = n_micro * s1_pp_dp
        if args.text_batch_size % s1_chunk:
            args.text_batch_size = ((args.text_batch_size + s1_chunk - 1)
                                    // s1_chunk) * s1_chunk
            logger.info("pipeline_parallel: text_batch_size rounded up "
                        "to %d (%d microbatches x dp=%d)",
                        args.text_batch_size, n_micro, s1_pp_dp)
        logger.info("mesh: stage=%d x data=%d (GPipe stage-1+2, "
                    "%d microbatches)", args.pipeline_parallel, pp_dp,
                    n_micro)
    elif args.tensor_parallel > 1:
        from aaclip_tpu.parallel import tensor as tpar
        mesh = tpar.make_mesh_2d(args.tensor_parallel)
        n_dev = dict(mesh.shape)["data"]
        logger.info("mesh: data=%d x model=%d", n_dev, args.tensor_parallel)
    elif args.data_parallel:
        mesh = sh.make_data_mesh()
        n_dev = len(jax.devices())

    def device_batch(batch):
        """numpy batch dict -> device arrays (+ class idx & validity)."""
        images = batch["image"]
        mask = batch["mask"].reshape(images.shape[0], args.img_size, args.img_size)
        label = batch["label"]
        class_idx = np.array([cls_to_idx[c] for c in batch["class_name"]], np.int32)
        valid = (np.arange(images.shape[0]) < batch["n_valid"]).astype(np.float32)
        arrays = [images, mask, label, class_idx, valid]
        if mesh is not None:
            (images, mask, label, class_idx), valid_arr = \
                sh.pad_batch_to_devices(arrays[:4], valid, n_dev)
            return sh.shard_batch(mesh, images, mask, label, class_idx,
                                  valid_arr)
        return tuple(jnp.asarray(a) for a in arrays)

    if args.cache_device and num_hosts > 1:
        raise SystemExit("--cache_device is single-host (per-host caches "
                         "would duplicate the dataset; use the loader's "
                         "host sharding instead)")

    def make_train_loader(ds, batch_size, text_stage, seed):
        """BatchLoader, or the device-resident cache when --cache_device:
        raw uint8 dataset uploaded to HBM once, batches gathered +
        jittered + normalized + augmented on device (the round-4 fix for
        the input-transfer-bound train wall rate, docs/PERFORMANCE.md).
        ``seed`` drives the shuffle permutation (stage-2 historically uses
        seed+1 — preserved in both loader kinds)."""
        if args.cache_device:
            from aaclip_tpu.data.device_cache import (DeviceCacheLoader,
                                                      cache_nbytes)
            nb = cache_nbytes(len(ds), args.img_size)
            logger.info("cache_device: uploading %d raw samples "
                        "(~%.2f GB uint8) to device memory", len(ds),
                        nb / 1e9)
            return DeviceCacheLoader(ds, cls_to_idx, batch_size,
                                     seed, text_stage=text_stage,
                                     aug_base=aug_base)
        return BatchLoader(ds, batch_size, shuffle=True, seed=seed,
                           num_workers=args.num_workers, host_id=host_id,
                           num_hosts=num_hosts)

    def prepare_batch(prof, batch, stage, epoch, it):
        """Batch -> 5 device arrays; cache batches arrive pre-assembled."""
        if args.cache_device:
            return batch
        with prof.phase("h2d"):
            images, mask, label, class_idx, valid = device_batch(batch)
        with prof.phase("augment_dispatch"):
            images, mask = maybe_augment(images, mask, stage, epoch, it)
        return images, mask, label, class_idx, valid

    # ---- stage 1 ----------------------------------------------------------
    if adapt_text and text_start_epoch < args.text_epoch:
        from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn
        s1_mesh = mesh if args.tensor_parallel > 1 else None
        if s1_mesh is not None:
            # tensor parallelism: the TP closures replace the Pallas
            # kernels (single-shard programs) for both the surgery-feature
            # trunk and the text tower — same contract as stage 2
            attn_fn = vv_attn_fn = None
        else:
            attn_fn = maybe_make_attn_fn(cfg, policy)
            # the packed Pallas V-V kernel implements the spatial
            # semantics; the reference-exact batch mode builds its own
            # (cheap) attention
            vv_attn_fn = (maybe_make_attn_fn(cfg, policy, vv=True)
                          if args.vv_mode == "spatial" else None)
        if args.pipeline_parallel > 1:
            # GPipe over the surgery-feature trunk: layers/pp blocks per
            # device, microbatches streamed — batch-mode V-V couples per
            # MICROBATCH (docs/PARITY.md); the text-tower update below
            # stays unsharded (its gradient path is context-length-sized)
            from aaclip_tpu.parallel.pipeline import (
                make_pp_stage1_features_fn)
            if args.feature_chunk:
                raise SystemExit(
                    "--feature_chunk does not compose with "
                    "--pipeline_parallel (GPipe microbatches already "
                    "bound peak memory; raise --pp_microbatches instead)")
            feats_fn = make_pp_stage1_features_fn(
                clip_params, cfg, pp=args.pipeline_parallel,
                n_micro=args.pp_microbatches or None, dp=s1_pp_dp,
                surgery_until_layer=args.surgery_until_layer,
                policy=policy, attn_fn=attn_fn, vv_attn_fn=vv_attn_fn,
                vv_mode=args.vv_mode)
        else:
            feats_fn = stage1_features_fn(
                clip_params, cfg,
                surgery_until_layer=args.surgery_until_layer,
                policy=policy, attn_fn=attn_fn, vv_attn_fn=vv_attn_fn,
                vv_mode=args.vv_mode, chunk=args.feature_chunk or None,
                mesh=s1_mesh, sequence_parallel=args.sequence_parallel)
        # text-tower remat: 'selective' is always safe (the saved tensors
        # are context-length-sized) and measured fastest; 'off' can OOM at
        # large prompt batches with XLA-attention probabilities
        s1_remat = ("selective" if args.remat == "auto" else
                    {"full": True, "selective": "selective",
                     "off": False}[args.remat])
        step_fn = make_stage1_step(
            clip_params, cfg, acfg, text_tx, prompt_tokens,
            text_norm_weight=args.text_norm_weight,
            img_size=args.img_size, policy=policy, remat=s1_remat,
            mesh=s1_mesh, sequence_parallel=args.sequence_parallel)
        loader = make_train_loader(text_ds, args.text_batch_size,
                                   text_stage=True, seed=args.seed)
        loader.epoch = text_start_epoch
        for epoch in range(text_start_epoch, args.text_epoch):
            logger.info("training text epoch %d:", epoch)
            timer = StepTimer()  # per-epoch: checkpoint saves excluded
            prof = HostLoopProfiler(enabled=args.profile_input)
            drain = ThrottledLossDrain(args.loss_fetch_every)
            for it, batch in enumerate(prof.wrap(loader)):
                images, mask, label, class_idx, valid = \
                    prepare_batch(prof, batch, 1, epoch, it)
                # valid: a padded final batch must not leak pad rows into
                # the batch-coupled V-V softmax (reference runs the smaller
                # unpadded tail batch); spatial mode ignores it
                with prof.phase("features_dispatch"):
                    feats = feats_fn(images, valid)
                with prof.phase("step_dispatch"):
                    text_state, loss = step_fn(text_state, feats, mask,
                                               class_idx, valid)
                with prof.phase("loss_fetch"):
                    drain.append(loss)  # blocks only every K steps
                timer.tick(images.shape[0])
            losses = drain.drain()
            timer.stop()  # losses drained -> device idle; close the window
            logger.info("loss: %s", float(np.mean(losses)))
            logger.info("throughput: %.2f img/s", timer.rate())
            prof.report(logger)
            ckpt.save_adapter_checkpoint_any(
                text_ckpt, epoch + 1, text_state.params,
                text_state.opt_state, int(text_state.step),
                backend=args.ckpt_backend)

    # ---- anchors for stage 2 (reference train.py:338-344) ----------------
    text_adapter = text_state.params if args.text_epoch != 0 else None
    enc = make_anchor_encoder(clip_params, cfg, acfg, text_adapter,
                              policy=policy)
    anchor_dict = encode_dataset_anchors(enc, args.dataset)
    anchors_table = np.stack([np.asarray(anchor_dict[c]) for c in class_names])

    # ---- stage 2 ----------------------------------------------------------
    from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn
    s2_attn_fn = maybe_make_attn_fn(cfg, policy, differentiable=True)
    if args.remat == "auto":
        s2_remat = "selective" if s2_attn_fn is not None else True
    else:
        s2_remat = {"full": True, "selective": "selective",
                    "off": False}[args.remat]
    if args.pipeline_parallel > 1:
        from aaclip_tpu.parallel.pipeline import make_pp_stage2_step
        step_fn = make_pp_stage2_step(
            clip_params, cfg, acfg, image_tx, anchors_table,
            pp=args.pipeline_parallel, n_micro=args.pp_microbatches,
            dp=pp_dp, img_size=args.img_size, policy=policy,
            # pp supports full/off remat only (--remat selective is
            # rejected above; 'auto' resolves to full here)
            attn_fn=s2_attn_fn, remat=bool(s2_remat))
    else:
        step_fn = make_stage2_step(clip_params, cfg, acfg, image_tx,
                                   anchors_table, img_size=args.img_size,
                                   policy=policy, attn_fn=s2_attn_fn,
                                   remat=s2_remat,
                                   mesh=mesh if args.tensor_parallel > 1
                                   else None,
                                   sequence_parallel=args.sequence_parallel,
                                   grad_accum=args.grad_accum)
    loader = make_train_loader(image_ds, args.image_batch_size,
                               text_stage=False, seed=args.seed + 1)
    loader.epoch = image_start_epoch
    fused_step = None
    if args.fused_assemble:  # parse_args already enforced --cache_device
        # stage 2 only: stage 1's device work is two programs (feature
        # extraction + text step) with a host hop between, so folding
        # assembly buys nothing there
        fused_step = loader.make_fused_step(step_fn)
        logger.info("fused_assemble: batch k+1 assembles inside step k's "
                    "program")
    for epoch in range(image_start_epoch, args.image_epoch):
        logger.info("training image epoch %d:", epoch)
        timer = StepTimer()  # per-epoch: checkpoint saves excluded
        prof = HostLoopProfiler(enabled=args.profile_input)
        drain = ThrottledLossDrain(args.loss_fetch_every)
        if fused_step is not None:
            plan = loader.epoch_plan()
            with prof.phase("assemble_dispatch"):
                batch = loader.assemble(plan[0][0], plan[0][1])
            valid = jnp.asarray(plan[0][2])
            for it in range(len(plan)):
                # the final step still needs SOME next-plan input: reuse
                # step 0's (one discarded assemble ~ a few ms, vs a whole
                # second compiled last-step program through the relay)
                nidx, nkey, nvalid = plan[(it + 1) % len(plan)]
                with prof.phase("step_dispatch"):
                    image_state, loss, batch = fused_step(
                        image_state, *batch, valid, nidx, nkey)
                valid = jnp.asarray(nvalid)
                with prof.phase("loss_fetch"):
                    drain.append(loss)  # blocks only every K steps
                timer.tick(args.image_batch_size)
            loader.advance_epoch()
        else:
            for it, batch in enumerate(prof.wrap(loader)):
                images, mask, label, class_idx, valid = \
                    prepare_batch(prof, batch, 2, epoch, it)
                with prof.phase("step_dispatch"):
                    image_state, loss = step_fn(image_state, images, mask,
                                                label, class_idx, valid)
                with prof.phase("loss_fetch"):
                    drain.append(loss)  # blocks only every K steps
                timer.tick(images.shape[0])
        losses = drain.drain()
        timer.stop()  # losses drained -> device idle; close the window
        logger.info("loss: %s", float(np.mean(losses)))
        logger.info("throughput: %.2f img/s", timer.rate())
        prof.report(logger)
        ckpt.save_adapter_checkpoint_any(
            image_ckpt, epoch + 1, image_state.params,
            image_state.opt_state, int(image_state.step),
            backend=args.ckpt_backend)
        ckpt.save_adapter_checkpoint_any(
            os.path.join(args.save_path, f"image_adapter_{epoch + 1}.npz"),
            epoch + 1, image_state.params, image_state.opt_state,
            int(image_state.step), backend=args.ckpt_backend)
    ckpt.wait_for_async_saves()
    logger.info("done")


if __name__ == "__main__":
    main()

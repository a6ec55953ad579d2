"""North-star benchmark: anomaly-maps/sec/chip for the flagship inference
path (ViT-L-14-336 @ 518px, adapted forward -> fused anomaly map).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is measured against the REFERENCE_BASELINE_* constants —
the reference publishes no throughput numbers (SURVEY §6) and no GPU
exists in this environment, so each constant is an analytic estimate of
the as-published PyTorch pipeline on an A100-SXM, derived from the
pipeline's FLOP count and the datasheet: full arithmetic in
docs/PERFORMANCE.md ("Reference baseline derivation"). They adopt the
TF32 band, which is GENEROUS to the reference (as written it runs pure
fp32 with torch's TF32 default off, ~3x slower). Replace with fresh
measurements if GPU hardware becomes available.

Flags: --batch_size, --precision, --steps, --model_name, --img_size.
"""

from __future__ import annotations

import argparse
import json
import os
import time


# Analytic single-GPU (A100, TF32 band) estimates for the reference
# pipeline; derivations in docs/PERFORMANCE.md. ~1.04 TFLOP/map inference;
# stage-2 ~3.1 TFLOP/img (backward reaches layer-0 adapters, batch 2);
# stage-1 ~2.2 TFLOP/img (two frozen ViT-L forwards).
REFERENCE_BASELINE_MAPS_PER_SEC = 40.0
REFERENCE_BASELINE_STAGE2_IMG_PER_SEC = 10.0
REFERENCE_BASELINE_STAGE1_IMG_PER_SEC = 20.0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", default="ViT-L-14-336")
    parser.add_argument("--img_size", type=int, default=518)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--precision", default=None,
                        choices=["fp32", "fp32_high", "bf16", "int8"],
                        help="default: bf16 (int8 is +5%% but failed the "
                             "round-4 scaled image-metric fidelity gate — "
                             "docs/PERFORMANCE.md 'Task-level fidelity'; "
                             "opt in explicitly if pixel-level metrics "
                             "are all you serve)")
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--bf16_until", type=int, default=None,
                        help="override the policy's staged-precision trunk "
                             "depth (leading vision blocks at single-pass "
                             "bf16 matmuls; inference path only)")
    parser.add_argument("--int8_until", type=int, default=None,
                        help="with --precision int8: quantize only the "
                             "first K vision blocks (mixed prefix), keep "
                             "the rest bf16. Default 0 = whole trunk")
    parser.add_argument("--attn", default="pallas", choices=["xla", "pallas"])
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of the timed loop")
    parser.add_argument("--mode", default="infer",
                        choices=["infer", "train", "train_stage1", "serve"],
                        help="infer = anomaly-map throughput (north star); "
                             "train = stage-2 update-step throughput; "
                             "train_stage1 = text-anchor stage throughput; "
                             "serve = micro-batching engine under "
                             "concurrent-client load")
    parser.add_argument("--clients", type=int, default=8,
                        help="serve mode: concurrent client threads")
    parser.add_argument("--map_stride", type=int, default=1,
                        help="serve mode: clients request map[::s, ::s] — "
                             "sliced ON DEVICE by the engine, shrinking "
                             "the map-readback phase by s^2 (the dominant "
                             "serving phase on relay rigs; measured split "
                             "in docs/PERFORMANCE.md). 1 = full maps")
    parser.add_argument("--open_loop", type=float, default=None, metavar="RPS",
                        help="serve mode: submit at a fixed aggregate rate "
                             "(requests/sec) for --steps SECONDS instead of "
                             "closed-loop clients — measures the bounded "
                             "2-stage pipeline + admission control under "
                             "sustained load (rejects fast-fail, counted "
                             "separately)")
    parser.add_argument("--vv_mode", default="batch",
                        choices=["batch", "spatial"],
                        help="train_stage1 surgery V-V semantics: 'batch' "
                             "= reference-exact cross-batch attention "
                             "(docs/PARITY.md quirk), 'spatial' = per-"
                             "sample Pallas-accelerated form")
    parser.add_argument("--remat", default="full",
                        choices=["full", "selective", "off"],
                        help="train modes: per-block rematerialization. "
                             "'selective' saves attn/qkv/mlp matmul outputs "
                             "(backward recomputes only LN/activations; "
                             "needs the Pallas custom-VJP attention); 'off' "
                             "OOMs at production shapes")
    parser.add_argument("--feature_chunk", type=int, default=0,
                        help="train_stage1 mode: chunked surgery-feature "
                             "extraction (requires --vv_mode spatial); "
                             "unlocks batch sizes past the feature HBM "
                             "wall")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="train mode: split the batch into K "
                             "microbatches inside the step, accumulating "
                             "gradients (peak activation memory of a "
                             "batch/K backward)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="infer mode: shard the batch over all local "
                             "devices and report aggregate + per-chip "
                             "throughput (batch_size is per-chip)")
    parser.add_argument("--artifact", default=None,
                        help="serve mode: benchmark a frozen jax.export "
                             "artifact dir (tools/export_artifact.py) "
                             "instead of the live engine; model/precision "
                             "flags come from the artifact manifest")
    args = parser.parse_args(argv)
    if args.artifact and args.mode != "serve":
        parser.error("--artifact applies to --mode serve only")
    if args.precision is None:
        # headline default: bf16.  int8 (+5%) was the round-3 headline on
        # the strength of a 16-image A/B; the round-4 SCALED chip A/B
        # (tools/precision_ab.py, 256 images, unsaturated-by-construction)
        # failed the granularity-aware image-metric gate (image AUC delta
        # up to 1.66 points vs a 0.29 tolerance, worst-class score
        # Spearman 0.961, pixel AUPRO delta 0.46; pixel AUC/AP hold within
        # 0.17) — docs/PERFORMANCE.md "Task-level fidelity".  int8 stays
        # an explicit opt-in via --precision int8.
        args.precision = "bf16"

    from aaclip_tpu.utils.platform import (honor_env_platform,
                                           probe_devices_or_exit)
    honor_env_platform()
    # Bound the first relay contact: a dead axon relay hangs jax.devices()
    # forever, and the round driver runs this script unattended.
    probe_devices_or_exit()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aaclip_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import create_clip_params, init_adapter_params
    from aaclip_tpu.eval.predict import make_predict_fn
    from aaclip_tpu.ops.similarity import fused_postproc_matrix

    if args.mode == "serve":
        return bench_serve(args)  # the engine builds its own params
    if args.open_loop is not None:
        parser.error("--open_loop applies to --mode serve only")
    if args.map_stride != 1:
        parser.error("--map_stride applies to --mode serve only")

    cfg = get_config(args.model_name, args.img_size)
    acfg = AdapterConfig() if args.model_name != "tiny-test" else AdapterConfig(
        levels=(1, 2), image_adapt_until=1, text_adapt_until=1)
    policy = DtypePolicy.from_name(args.precision)
    if args.bf16_until is not None:
        import dataclasses
        policy = dataclasses.replace(policy, bf16_until=args.bf16_until)
    if args.int8_until is not None:
        import dataclasses
        if args.precision != "int8":
            parser.error("--int8_until requires --precision int8")
        policy = dataclasses.replace(policy, int8_until=args.int8_until)

    clip = create_clip_params(cfg, seed=0, policy=policy)
    adapters = init_adapter_params(jax.random.PRNGKey(1), cfg, acfg, policy)

    if args.mode in ("train", "train_stage1") and args.data_parallel:
        parser.error("--data_parallel currently applies to --mode infer only "
                     "(train.py --data_parallel benchmarks DP training)")
    if args.mode in ("train", "train_stage1") and args.precision == "int8":
        parser.error("--precision int8 is inference-only: the training "
                     "steps never quantize, so an int8-labeled train bench "
                     "would silently measure the bf16 path (train.py "
                     "rejects int8 for the same reason)")
    # reject mode-mismatched perf levers instead of silently ignoring them
    # (the user would believe they measured the flagged configuration)
    if args.grad_accum > 1 and args.mode != "train":
        parser.error("--grad_accum applies to --mode train only")
    if args.feature_chunk and args.mode != "train_stage1":
        parser.error("--feature_chunk applies to --mode train_stage1 only")
    if args.remat != "full" and args.mode not in ("train", "train_stage1"):
        parser.error("--remat applies to the train modes only")
    if args.vv_mode != "batch" and args.mode != "train_stage1":
        parser.error("--vv_mode applies to --mode train_stage1 only")
    if args.mode == "train":
        return bench_train(args, cfg, acfg, policy, clip, adapters)
    if args.mode == "train_stage1":
        return bench_train_stage1(args, cfg, acfg, policy, clip, adapters)

    attn_fn = None
    if args.attn == "pallas":
        from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn
        attn_fn = maybe_make_attn_fn(cfg, policy)
    effective_attn = "pallas" if attn_fn is not None else "xla"
    uint8_inputs = args.precision in ("bf16", "int8")

    mesh = None
    batch = args.batch_size
    if args.data_parallel:
        from aaclip_tpu.parallel import sharding as sh
        sh.initialize_multihost()
        mesh = sh.make_data_mesh()
        batch = args.batch_size * mesh.devices.size  # batch_size is per-chip
    predict = make_predict_fn(clip, cfg, acfg, img_size=args.img_size,
                              policy=policy, attn_fn=attn_fn,
                              uint8_inputs=uint8_inputs, mesh=mesh)

    rng = np.random.default_rng(0)
    if uint8_inputs:
        images = rng.integers(
            0, 256, (batch, 3, args.img_size, args.img_size), dtype=np.uint8)
    else:
        images = rng.standard_normal(
            (batch, 3, args.img_size, args.img_size)).astype(np.float32)
    if mesh is not None:
        from aaclip_tpu.parallel import sharding as sh
        images = sh.shard_batch(mesh, images)
    else:
        images = jnp.asarray(images)
    anchors = jnp.asarray(rng.standard_normal((cfg.embed_dim, 2)), jnp.float32)
    anchors = anchors / jnp.linalg.norm(anchors, axis=0, keepdims=True)
    M = jnp.asarray(fused_postproc_matrix(cfg.vision.grid, args.img_size,
                                          "Industrial"))
    image_adapter = adapters["image"]
    if mesh is not None:
        from aaclip_tpu.parallel import sharding as sh
        anchors, M = jax.device_put((anchors, M), sh.replicated(mesh))
        image_adapter = sh.replicate_tree(mesh, image_adapter)

    def _sync(p, s):
        # fetch a scalar: the relay's block_until_ready can return before
        # execution completes (CLAUDE.md); a host fetch cannot. The reduce
        # spans the FULL (possibly sharded) arrays so every device in a
        # --data_parallel mesh must have finished, not just shard 0.
        return float(jnp.sum(s)) + float(jnp.sum(p[:, 0, 0]))

    for _ in range(args.warmup):
        pix, score = predict(image_adapter, images, anchors, M)
    if args.warmup:
        _sync(pix, score)

    from aaclip_tpu.utils.profiling import profile_trace

    start = time.perf_counter()
    with profile_trace(args.profile_dir):
        for _ in range(args.steps):
            pix, score = predict(image_adapter, images, anchors, M)
        _sync(pix, score)
    elapsed = time.perf_counter() - start

    # without --data_parallel the jitted predict runs on ONE device —
    # dividing by local_device_count() would misreport per-chip throughput
    # N-fold on multi-device hosts
    n_chips = mesh.devices.size if mesh is not None else 1
    maps_per_sec = batch * args.steps / elapsed
    per_chip = maps_per_sec / n_chips
    if args.verbose:
        print(f"# devices={jax.devices()} elapsed={elapsed:.3f}s "
              f"batch={batch} steps={args.steps} chips={n_chips} "
              f"aggregate={maps_per_sec:.2f} maps/s")
    dp = f", dp={n_chips} chips" if mesh is not None else ""
    stage = f"+bf16x{policy.bf16_until}" if policy.bf16_until else ""
    if policy.quant_int8 and policy.int8_until:
        stage += f"+int8x{policy.int8_until}"
    print(json.dumps({
        "metric": "anomaly_maps_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": f"maps/s/chip ({args.model_name} @ {args.img_size}px, adapted fwd "
                f"+ fused map, {args.precision}{stage}, attn={effective_attn}{dp})",
        "vs_baseline": round(per_chip / REFERENCE_BASELINE_MAPS_PER_SEC, 3),
    }))




def bench_serve(args):
    """Micro-batching serving-engine throughput.

    Closed-loop (default): ``--clients`` threads submit pre-decoded images
    as fast as results return — steady-state capacity under matched load.

    Open-loop (``--open_loop RPS``): requests arrive at a fixed aggregate
    rate for ``--steps`` seconds regardless of completions — the regime the
    bounded 2-stage pipeline + admission control were built for; rejects
    (queue at max_queue) fast-fail and are reported separately from
    completions.

    ``--data_parallel`` shards each micro-batch over all local devices
    (max_batch must divide by the device count); with ``--artifact`` it
    means one replica per device instead — whole micro-batches dispatch
    round-robin and no divisibility rule applies.
    """
    import threading

    import numpy as np

    from aaclip_tpu.serve.server import EngineOverloadedError, InferenceEngine

    tiny = args.model_name == "tiny-test"
    if args.artifact:
        engine = InferenceEngine(artifact=args.artifact,
                                 max_batch=args.batch_size, precompile=True,
                                 data_parallel=args.data_parallel)
        args.img_size = engine.img_size  # clients must send artifact shapes
        m = engine._artifact.manifest    # honest labeling in the JSON line
        args.model_name = m["model_name"]
        args.precision = f"{m['precision']}+artifact"
    else:
        engine = InferenceEngine(
            model_name=args.model_name, img_size=args.img_size,
            datasets=("MVTec",), precision=args.precision,
            max_batch=args.batch_size, precompile=True,
            data_parallel=args.data_parallel,
            # anchors don't affect steady-state throughput; reuse them
            # across runs to cut relay cold-start via the env opt-in
            anchor_cache=os.environ.get("AACLIP_ANCHOR_CACHE") or None,
            adapter_cfg=(dict(levels=(1, 2), image_adapt_until=1,
                              text_adapt_until=1) if tiny else None))
    rng = np.random.default_rng(0)
    # live mode builds MVTec anchors; artifact mode serves whatever the
    # artifact bundled — take classes from the engine either way
    ds = sorted(engine.anchors)[0]
    classes = sorted(engine.anchors[ds])[:2]
    n_imgs = max(args.clients, 1)
    imgs = [rng.integers(0, 256, (3, args.img_size, args.img_size),
                         dtype=np.uint8) for _ in range(n_imgs)]

    # warmup: one request compiles + fills caches
    engine.submit(imgs[0], ds, classes[0], timeout=600)

    if args.open_loop is not None:
        n_ok, elapsed, extra = _serve_open_loop(
            args, engine, imgs, ds, classes, EngineOverloadedError)
    else:
        n_ok, elapsed, extra = _serve_closed_loop(args, engine, imgs, ds,
                                                  classes)
    engine.shutdown()
    stats = engine.stats()
    rate = n_ok / elapsed
    if args.verbose:
        print(f"# served {n_ok} requests in {elapsed:.2f}s; stats={stats}")
    n_chips = engine._dp_devices
    dp = f", dp={n_chips} chips" if args.data_parallel else ""
    if args.map_stride != 1:
        dp += f", map_stride={args.map_stride}"
    print(json.dumps({
        "metric": "serve_maps_per_sec_per_chip",
        "value": round(rate / n_chips, 2),
        "unit": f"maps/s/chip (serving engine, {args.model_name} @ "
                f"{args.img_size}px, {args.precision}, max_batch "
                f"{args.batch_size}, {extra}, occupancy "
                f"{stats['mean_batch_occupancy']}, p95 "
                f"{stats['latency_ms']['p95']}ms{dp})",
        # divides by the INFERENCE baseline constant: the reference has no
        # serving path at all, so the only comparable number is raw
        # maps/s — on this relay rig serve mode is transfer-bound, not
        # engine-bound (docs/PERFORMANCE.md, serving section)
        "vs_baseline": round(rate / n_chips / REFERENCE_BASELINE_MAPS_PER_SEC,
                             3),
    }))


def _serve_closed_loop(args, engine, imgs, ds, classes):
    """--clients threads, each resubmitting after its result returns."""
    import threading

    per_client = max(1, args.steps)
    done = [0] * args.clients

    def client(i):
        for k in range(per_client):
            engine.submit(imgs[i], ds, classes[k % len(classes)],
                          timeout=600, map_stride=args.map_stride)
            done[i] += 1

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    return sum(done), elapsed, f"{args.clients} closed-loop clients"


def _serve_open_loop(args, engine, imgs, ds, classes, EngineOverloadedError):
    """Fixed-rate arrivals for --steps seconds; rejects counted, not
    retried (each arrival is its own thread, as each HTTP request would
    be)."""
    import threading

    rps = args.open_loop
    duration = max(1.0, float(args.steps))
    n_total = max(1, int(rps * duration))
    counts = {"ok": 0, "rejected": 0, "err": 0}
    lock = threading.Lock()
    threads = []

    def fire(k):
        try:
            engine.submit(imgs[k % len(imgs)], ds,
                          classes[k % len(classes)], timeout=600,
                          map_stride=args.map_stride)
            outcome = "ok"
        except EngineOverloadedError:
            outcome = "rejected"
        except Exception:
            outcome = "err"
        with lock:
            counts[outcome] += 1

    t0 = time.perf_counter()
    for k in range(n_total):
        due = t0 + k / rps
        delay = due - time.perf_counter()
        if delay > 0:
            time.sleep(delay)
        t = threading.Thread(target=fire, args=(k,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    extra = (f"open-loop {rps:g} rps x {duration:g}s: {counts['ok']} ok, "
             f"{counts['rejected']} rejected, {counts['err']} errors")
    return counts["ok"], elapsed, extra


def bench_train(args, cfg, acfg, policy, clip, adapters):
    """Stage-2 update-step throughput (images/sec/chip)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state, make_stage2_step

    attn_fn = None
    if args.attn == "pallas":
        from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn
        attn_fn = maybe_make_attn_fn(cfg, policy, differentiable=True)
    effective_attn = "pallas" if attn_fn is not None else "xla"

    B = args.batch_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(
        (B, 3, args.img_size, args.img_size)), jnp.float32)
    mask = jnp.asarray(rng.random((B, args.img_size, args.img_size)) > 0.9,
                       jnp.float32)
    label = jnp.asarray(rng.integers(0, 2, B), jnp.int32)
    cidx = jnp.asarray(rng.integers(0, 2, B), jnp.int32)
    valid = jnp.ones((B,), jnp.float32)
    table = rng.standard_normal((2, cfg.embed_dim, 2)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    tx = make_image_optimizer()
    step = make_stage2_step(clip, cfg, acfg, tx, table,
                            img_size=args.img_size, policy=policy,
                            attn_fn=attn_fn,
                            remat={"full": True, "selective": "selective",
                                   "off": False}[args.remat],
                            grad_accum=args.grad_accum)
    state = init_state(adapters["image"], tx)
    for _ in range(args.warmup):
        state, loss = step(state, images, mask, label, cidx, valid)
        float(loss)
    start = time.perf_counter()
    prev = None
    for _ in range(args.steps):
        state, loss = step(state, images, mask, label, cidx, valid)
        # one-step-late fetch (the production train-loop pattern): the
        # host fetch of step k-1's loss overlaps step k's device work;
        # the final fetch below forces completion of the last step
        # (block_until_ready lies through the relay)
        if prev is not None:
            float(prev)
        prev = loss
    float(prev)
    elapsed = time.perf_counter() - start

    per_chip = args.batch_size * args.steps / elapsed  # single-device step
    print(json.dumps({
        "metric": "stage2_train_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": f"img/s/chip ({args.model_name} @ {args.img_size}px stage-2 "
                f"update, {args.precision}, attn={effective_attn}"
                + (f", grad_accum={args.grad_accum}" if args.grad_accum > 1
                   else "") + ")",
        "vs_baseline": round(per_chip / REFERENCE_BASELINE_STAGE2_IMG_PER_SEC, 3),
    }))


def bench_train_stage1(args, cfg, acfg, policy, clip, adapters):
    """Stage-1 throughput: surgery feature extraction + text-adapter update
    (images/sec/chip, end-to-end per batch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aaclip_tpu.text.anchors import dataset_prompt_tokens
    from aaclip_tpu.train.optim import make_text_optimizer
    from aaclip_tpu.train.steps import (
        init_state, make_stage1_step, stage1_features_fn)

    attn_fn = vv_attn_fn = None
    if args.attn == "pallas":
        from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn
        attn_fn = maybe_make_attn_fn(cfg, policy)
        if args.vv_mode == "spatial":
            vv_attn_fn = maybe_make_attn_fn(cfg, policy, vv=True)
    effective_attn = "pallas" if attn_fn is not None else "xla"

    B = args.batch_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(
        (B, 3, args.img_size, args.img_size)), jnp.float32)
    mask = jnp.asarray(rng.random((B, args.img_size, args.img_size)) > 0.9,
                       jnp.float32)
    n_cls = 2 if args.model_name == "tiny-test" else 12
    cidx = jnp.asarray(rng.integers(0, n_cls, B), jnp.int32)
    valid = jnp.ones((B,), jnp.float32)
    tokens = dataset_prompt_tokens(
        "VisA" if args.model_name != "tiny-test" else "MVTec")[:n_cls]
    feats_fn = stage1_features_fn(clip, cfg, policy=policy, attn_fn=attn_fn,
                                  vv_attn_fn=vv_attn_fn,
                                  vv_mode=args.vv_mode,
                                  chunk=args.feature_chunk or None)
    tx = make_text_optimizer()
    step = make_stage1_step(clip, cfg, acfg, tx, tokens,
                            img_size=args.img_size, policy=policy,
                            remat={"full": True, "selective": "selective",
                                   "off": False}[args.remat])
    state = init_state(adapters["text"], tx)
    for _ in range(args.warmup):
        feats = feats_fn(images, valid)  # production passes valid (train.py)
        state, loss = step(state, feats, mask, cidx, valid)
        float(loss)
    start = time.perf_counter()
    prev = None
    for _ in range(args.steps):
        feats = feats_fn(images, valid)
        state, loss = step(state, feats, mask, cidx, valid)
        if prev is not None:  # one-step-late fetch, see bench_train
            float(prev)
        prev = loss
    float(prev)
    elapsed = time.perf_counter() - start

    per_chip = args.batch_size * args.steps / elapsed  # single-device step
    print(json.dumps({
        "metric": "stage1_train_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": f"img/s/chip ({args.model_name} @ {args.img_size}px stage-1: "
                f"surgery feats + text update, {args.precision}, "
                f"attn={effective_attn}, vv={args.vv_mode})",
        "vs_baseline": round(per_chip / REFERENCE_BASELINE_STAGE1_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

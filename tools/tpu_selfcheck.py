"""One-command hardware validation on the real TPU.

The pytest suite runs on CPU (8 virtual devices) where Pallas executes in
interpret mode and matmul precision flags are no-ops.  This script drives
the SAME checks on the actual chip:

  1. Pallas packed attention (std + V-V) vs XLA attention, bf16 + fp32.
  2. The custom-VJP backward vs jax.grad through XLA attention.
  3. fp32 / fp32_high / bf16 / int8 predict deviations vs the fp32 parity path.
  4. Stage-2 training-step loss parity: Pallas diff-attention vs XLA.
  5. Throughput smoke for all four precisions (reported, not asserted).
  6. Experimental fused-block kernels (ops/fused_block.py) vs the jnp
     block — Mosaic-compiled on the chip, not interpret mode.

Usage: python tools/tpu_selfcheck.py [--model tiny-test|ViT-L-14-336]
Exit code 0 = every assertion held on this hardware.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="ViT-L-14-336")
    parser.add_argument("--img_size", type=int, default=518)
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args(argv)

    from aaclip_tpu.utils.platform import probe_devices_or_exit
    probe_devices_or_exit()  # dead TPU relay: fast exit, not a silent hang

    import numpy as np
    import jax
    import jax.numpy as jnp

    from aaclip_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import create_clip_params, init_adapter_params
    from aaclip_tpu.eval.predict import make_predict_fn
    from aaclip_tpu.models import layers as L
    from aaclip_tpu.ops.flash_attention import make_attn_fn
    from aaclip_tpu.ops.similarity import fused_postproc_matrix

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    assert dev.platform == "tpu", "run this on the TPU host"

    cfg = get_config(args.model, args.img_size)
    acfg = (AdapterConfig() if args.model != "tiny-test" else
            AdapterConfig(levels=(1, 2), image_adapt_until=1,
                          text_adapt_until=1))
    rng = np.random.default_rng(0)

    # ---- 1. kernel vs XLA attention, both dtypes, both variants ----------
    D, H, S = cfg.vision.width, cfg.vision.heads, cfg.vision.seq_len
    p = {
        "w_qkv": jnp.asarray(rng.standard_normal((D, 3 * D)) * D ** -0.5, jnp.float32),
        "b_qkv": jnp.asarray(rng.standard_normal(3 * D) * 0.02, jnp.float32),
        "w_out": jnp.asarray(rng.standard_normal((D, D)) * D ** -0.5, jnp.float32),
        "b_out": jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((2, S, D)), jnp.float32)
    # the fp32 XLA reference depends only on vv — compute each ONCE, not
    # once per precision (each recompute is a compile + run over the relay)
    wants = {vv: np.asarray(jax.jit(
        lambda x, p, vv=vv: L.attention(x, p, H, vv=vv,
                                        policy=DtypePolicy.fp32())
    )(x, p)) for vv in (False, True)}
    for prec_name, policy, tol in [("fp32", DtypePolicy.fp32(), 5e-5),
                                   ("fp32_high", DtypePolicy.fp32_high(), 5e-4),
                                   ("bf16", DtypePolicy.bf16(), 3e-2)]:
        for vv in (False, True):
            want = wants[vv]
            fn = make_attn_fn(H, policy, vv=vv)
            got = np.asarray(jax.jit(fn)(x, p))
            d = np.abs(got.astype(np.float64) - want).max()
            scale = np.abs(want).max()
            print(f"attention {prec_name} vv={vv}: max|d|={d:.3e} "
                  f"(scale {scale:.2f})")
            assert d <= tol * max(scale, 1.0), (prec_name, vv, d)

    # batch-coupled V-V (the reference layout quirk, stage-1 default —
    # docs/PARITY.md): precision-policy parity on the real chip
    want = np.asarray(jax.jit(
        lambda x, p: L.attention_vv_batch(x, p, H, policy=DtypePolicy.fp32())
    )(x, p))
    for prec_name, policy, tol in [("fp32_high", DtypePolicy.fp32_high(), 5e-4),
                                   ("bf16", DtypePolicy.bf16(), 3e-2)]:
        got = np.asarray(jax.jit(
            lambda x, p: L.attention_vv_batch(x, p, H, policy=policy))(x, p))
        d = np.abs(got.astype(np.float64) - want).max()
        scale = np.abs(want).max()
        print(f"attention {prec_name} vv=batch: max|d|={d:.3e} "
              f"(scale {scale:.2f})")
        assert d <= tol * max(scale, 1.0), (prec_name, d)

    # ---- 2. custom VJP vs XLA gradient ------------------------------------
    for policy, tol in [(DtypePolicy.fp32(), 1e-4),
                        (DtypePolicy.bf16(), 5e-2)]:
        fn = make_attn_fn(H, policy, differentiable=True)
        ref = lambda x, p: L.attention(x, p, H, policy=DtypePolicy.fp32())
        # params passed as ARGUMENTS (CLAUDE.md: closed-over params become
        # graph constants and stall remote compiles)
        g_k = jax.jit(jax.grad(
            lambda x, p: jnp.sum(jnp.tanh(fn(x, p)))))(x, p)
        g_x = jax.jit(jax.grad(
            lambda x, p: jnp.sum(jnp.tanh(ref(x, p)))))(x, p)
        d = np.abs(np.asarray(g_k, np.float64) - np.asarray(g_x)).max()
        s = np.abs(np.asarray(g_x)).max()
        print(f"vjp {policy.precision or 'bf16'}: max|dgrad|={d:.3e} (scale {s:.2e})")
        assert d <= tol * max(s, 1e-3), d

    # ---- 3 + 5. predict deviations + throughput ---------------------------
    clip = create_clip_params(cfg, seed=0)
    adapters = init_adapter_params(jax.random.PRNGKey(1), cfg, acfg)
    B = args.batch
    images = jnp.asarray(rng.standard_normal(
        (B, 3, args.img_size, args.img_size)), jnp.float32)
    anchors = jnp.asarray(rng.standard_normal((cfg.embed_dim, 2)), jnp.float32)
    anchors = anchors / jnp.linalg.norm(anchors, axis=0, keepdims=True)
    M = jnp.asarray(fused_postproc_matrix(cfg.vision.grid, args.img_size,
                                          "Industrial"))
    ref_pix = None
    for name, policy, tol in [
            ("fp32", DtypePolicy.fp32(), 0.0),
            # pure 3-pass matmuls (round-2 fp32_high): ~3e-5 span deviation
            ("fp32_high unstaged", DtypePolicy.fp32_high().unstaged(), 2e-3),
            # production fp32_high: bf16-staged first 6 blocks (round 3);
            # measured ~1.9e-2 abs on these synthetic maps
            ("fp32_high", DtypePolicy.fp32_high(), 5e-2),
            ("bf16", DtypePolicy.bf16(), 1.5e-1),
            # int8 quantized trunk (ops/quant.py): rounding noise on top
            # of bf16's; task metrics chip-verified equal (PERFORMANCE.md)
            ("int8", DtypePolicy.int8(), 2.5e-1)]:
        attn = make_attn_fn(cfg.vision.heads, policy)
        pred = make_predict_fn(clip, cfg, acfg, img_size=args.img_size,
                               policy=policy, attn_fn=attn)
        pix, sc = pred(adapters["image"], images, anchors, M)
        float(jnp.sum(pix))
        t0 = time.perf_counter()
        for _ in range(5):
            pix, sc = pred(adapters["image"], images, anchors, M)
        float(jnp.sum(pix)) + float(jnp.sum(sc))
        rate = B * 5 / (time.perf_counter() - t0)
        pix = np.asarray(pix, np.float64)
        if ref_pix is None:
            ref_pix = pix
            print(f"predict {name}: {rate:.1f} maps/s (parity reference)")
            continue
        d = np.abs(pix - ref_pix).max()
        print(f"predict {name}: {rate:.1f} maps/s, max|pixel d vs fp32|={d:.3e}")
        assert d <= tol, (name, d)

    # ---- 4. training-step parity: Pallas VJP vs XLA ------------------------
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state, make_stage2_step

    mask = jnp.asarray(rng.random((B, args.img_size, args.img_size)) > 0.9,
                       jnp.float32)
    label = jnp.asarray(rng.integers(0, 2, B), jnp.int32)
    cidx = jnp.asarray(rng.integers(0, 2, B), jnp.int32)
    valid = jnp.ones((B,), jnp.float32)
    table = rng.standard_normal((2, cfg.embed_dim, 2)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    tx = make_image_optimizer(1e-4)
    policy = DtypePolicy.fp32()
    losses = {}
    for label_name, attn in [
            ("xla", None),
            ("pallas", make_attn_fn(cfg.vision.heads, policy,
                                    differentiable=True))]:
        step = make_stage2_step(clip, cfg, acfg, tx, table,
                                img_size=args.img_size, policy=policy,
                                attn_fn=attn)
        st = init_state(adapters["image"], tx)
        st, loss = step(st, images, mask, label, cidx, valid)
        losses[label_name] = float(loss)
    d = abs(losses["xla"] - losses["pallas"])
    print(f"stage-2 fp32 loss: xla={losses['xla']:.6f} "
          f"pallas={losses['pallas']:.6f} |d|={d:.2e}")
    assert d <= 1e-3 * max(abs(losses["xla"]), 1.0)

    # ---- 6. fused-block kernels (experimental opt-in) ---------------------
    from aaclip_tpu.ops import fused_block as FB

    blk = {
        "ln_1": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "ln_2": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "attn": p,
        "mlp": {
            "w_fc": jnp.asarray(
                rng.standard_normal((D, 4 * D)) * D ** -0.5, jnp.float32),
            "b_fc": jnp.asarray(rng.standard_normal(4 * D) * 0.02, jnp.float32),
            "w_proj": jnp.asarray(
                rng.standard_normal((4 * D, D)) * (4 * D) ** -0.5, jnp.float32),
            "b_proj": jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32),
        },
    }
    for prec_name, policy, tol in [("fp32", DtypePolicy.fp32(), 5e-5),
                                   ("bf16", DtypePolicy.bf16(), 3e-2)]:
        act = L.policy_act(policy)
        xc = x.astype(policy.compute_dtype)  # bf16 residual stream, as in
        # the production fast path (embed() carries compute dtype)
        want = np.asarray(jax.jit(
            lambda x, b: L.residual_block(x, b, H, act=act, policy=policy)
        )(xc, blk), np.float64)
        fn = FB.make_block_fn(H, policy, act=act)
        got = np.asarray(jax.jit(fn)(xc, blk), np.float64)
        d = np.abs(got - want).max()
        s = np.abs(want).max()
        print(f"fused block {prec_name}: max|d|={d:.3e} (scale {s:.2f})")
        assert d <= tol * max(s, 1.0), (prec_name, d)

    print("TPU selfcheck: ALL OK")


if __name__ == "__main__":
    main()

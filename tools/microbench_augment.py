"""Micro-benchmark: where does the on-device input path spend its time?

The cache_device chip A/B (docs/PERFORMANCE.md) showed the stage-2 train
wall at ~1400 ms/step vs the bench's 899 ms bare step with ZERO per-step
host transfer — so ~500 ms/step is device-side input assembly.  This
decomposes it at the production shape (batch 32 @ 518px):

* cache gather (jnp.take of uint8 images+masks by index);
* color jitter (ops/augment.color_jitter_device — PIL chain);
* normalize (uint8 -> CLIP-normalized f32);
* joint geometric augment (rotation gather + translation gather + flips);
* the fused cache-assemble program (gather+jitter+normalize+augment) in
  BOTH forms: the round-4-early float-gather form and the shipping
  packed-uint32 form (ops/augment.joint_geometric_augment_device_u8);
* with --with_step: a production stage-2 step (bf16, Pallas attention,
  selective remat, --grad_accum) on pre-staged inputs, then
  assemble+step chained — the difference is what input assembly REALLY
  costs e2e (device programs serialize, so expect ~the assemble time).

Usage: python tools/microbench_augment.py [--steps 20] [--batch 32]
       [--with_step] [--grad_accum 4]
(TPU; relay-safe chained timing, one scalar fetch per measurement.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aaclip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp
import numpy as np

from aaclip_tpu.utils.cache import enable_compilation_cache


def chain_time(fn, steps, *args, probe):
    """fn(i, *args) -> array; iterations chained via fold-in of a probe
    scalar so the relay cannot reorder; one fetch at the end."""
    out = fn(0, *args)
    float(probe(out))
    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        out = fn(i, *args)
    float(probe(out))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=518)
    ap.add_argument("--with_step", action="store_true",
                    help="also time a production stage-2 step (bf16, "
                         "Pallas attn, selective remat) alone vs chained "
                         "behind the packed assemble")
    ap.add_argument("--grad_accum", type=int, default=4)
    ap.add_argument("--model", default="ViT-L-14-336",
                    help="--with_step model (tiny-test for a CPU smoke)")
    args = ap.parse_args()
    enable_compilation_cache()

    B, S = args.batch, args.img
    N = 192  # cache size of the chip A/B dataset
    rng = np.random.default_rng(0)
    imgs_u8 = jnp.asarray(rng.integers(0, 256, (N, 3, S, S), np.uint8))
    masks_u8 = jnp.asarray(rng.integers(0, 2, (N, S, S), np.uint8))
    key0 = jax.random.PRNGKey(0)

    from aaclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    from aaclip_tpu.ops.augment import (color_jitter_device,
                                        joint_geometric_augment_device,
                                        joint_geometric_augment_device_u8)

    mean = jnp.asarray(CLIP_MEAN)[None, :, None, None]
    std = jnp.asarray(CLIP_STD)[None, :, None, None]

    idx0 = jnp.asarray(rng.integers(0, N, (B,), np.int32))

    @jax.jit
    def gather(i, imgs, masks, idx):
        idx = (idx + i) % N
        return jnp.take(imgs, idx, axis=0), jnp.take(masks, idx, axis=0)

    @jax.jit
    def jitter(i, im):
        return color_jitter_device(jax.random.fold_in(key0, i), im)

    @jax.jit
    def normalize(i, im):
        return (im.astype(jnp.float32) + jnp.float32(i)) / 255.0 * (
            1.0 / std) - mean / std

    @jax.jit
    def geom(i, x, m):
        k = jax.random.fold_in(key0, i)
        return joint_geometric_augment_device(k, x, m)[0]

    @jax.jit
    def assemble(i, imgs, masks, idx):
        idx = (idx + i) % N
        im = jnp.take(imgs, idx, axis=0)
        mk = jnp.take(masks, idx, axis=0)
        kj, kg = jax.random.split(jax.random.fold_in(key0, i))
        im = color_jitter_device(kj, im)
        x = (im.astype(jnp.float32) / 255.0 - mean) / std
        x, m = joint_geometric_augment_device(kg, x, mk.astype(jnp.float32))
        return x

    @jax.jit
    def assemble_packed(i, imgs, masks, idx):
        # the SHIPPING device_cache._assemble form: packed u32 geometric
        # gather, normalize after (bit-identical to `assemble` above —
        # test_packed_augment_matches_float_path)
        idx = (idx + i) % N
        im = jnp.take(imgs, idx, axis=0)
        mk = jnp.take(masks, idx, axis=0)
        kj, kg = jax.random.split(jax.random.fold_in(key0, i))
        im = color_jitter_device(kj, im)
        out_u8, out_m, valid = joint_geometric_augment_device_u8(kg, im, mk)
        x = jnp.where(valid[:, None],
                      (out_u8.astype(jnp.float32) / 255.0 - mean) / std, 0.0)
        return x, out_m.astype(jnp.float32) * valid.astype(jnp.float32)

    print(f"batch {B} @ {S}px, cache N={N}, steps={args.steps}")
    t = chain_time(lambda i, *a: gather(i, *a)[0], args.steps, imgs_u8,
                   masks_u8, idx0, probe=lambda o: jnp.sum(o[0, 0, :2, 0]))
    print(f"  gather (u8 img+mask by idx):    {t*1e3:8.2f} ms")
    im_b = jnp.take(imgs_u8, idx0, axis=0)
    t = chain_time(lambda i, im: jitter(i, im), args.steps, im_b,
                   probe=lambda o: jnp.sum(o[0, 0, :2, 0]))
    print(f"  color jitter (PIL chain):       {t*1e3:8.2f} ms")
    t = chain_time(lambda i, im: normalize(i, im), args.steps, im_b,
                   probe=lambda o: jnp.sum(o[0, 0, :2, 0]))
    print(f"  normalize u8->f32:              {t*1e3:8.2f} ms")
    x_b = (im_b.astype(jnp.float32) / 255.0 - mean) / std
    m_b = jnp.take(masks_u8, idx0, axis=0).astype(jnp.float32)
    t = chain_time(lambda i, x, m: geom(i, x, m), args.steps, x_b, m_b,
                   probe=lambda o: jnp.sum(o[0, 0, :2, 0]))
    print(f"  geometric augment (2x affine):  {t*1e3:8.2f} ms")
    t = chain_time(lambda i, *a: assemble(i, *a), args.steps, imgs_u8,
                   masks_u8, idx0, probe=lambda o: jnp.sum(o[0, 0, :2, 0]))
    print(f"  fused assemble (float gather):  {t*1e3:8.2f} ms")
    t = chain_time(lambda i, *a: assemble_packed(i, *a)[0], args.steps,
                   imgs_u8, masks_u8, idx0,
                   probe=lambda o: jnp.sum(o[0, 0, :2, 0]))
    print(f"  fused assemble (packed, ships): {t*1e3:8.2f} ms")

    # ---- geometric-gather variants (the dominant cost) ----------------
    from aaclip_tpu.ops.augment import _draw_geom_params, _fused_geom_indices

    def geom_indices(i, B, H, W):
        keys = jax.random.split(jax.random.fold_in(key0, i), B)
        def one(k):
            angle, ty, tx, hf, vf = _draw_geom_params(k, H, W)
            return _fused_geom_indices(angle, ty, tx, hf, vf, H, W)
        return jax.vmap(one)(keys)

    @jax.jit
    def geom_flat(i, x, m):
        # 1-D gather: flatten [C, H, W] -> [C, H*W], take(sy*W+sx)
        B, C, H, W = x.shape
        sy, sx, valid = geom_indices(i, B, H, W)
        flat = sy * W + sx                                  # [B, H, W]
        def one(img, msk, fl, va):
            st = jnp.concatenate([img, msk[None]], axis=0).reshape(C + 1, -1)
            out = jnp.take(st, fl.reshape(-1), axis=1).reshape(C + 1, H, W)
            return out * va[None].astype(out.dtype)
        return jax.vmap(one)(x, m, flat, valid)[:, :3]

    @jax.jit
    def geom_packed(i, im_u8, mk_u8):
        # pack r,g,b,mask into one uint32/pixel; gather 1/4 the elements;
        # unpack + normalize + mask after (elementwise commutes w/ gather)
        B, C, H, W = im_u8.shape
        p = (im_u8[:, 0].astype(jnp.uint32)
             | (im_u8[:, 1].astype(jnp.uint32) << 8)
             | (im_u8[:, 2].astype(jnp.uint32) << 16)
             | (mk_u8.astype(jnp.uint32) << 24))            # [B, H, W]
        sy, sx, valid = geom_indices(i, B, H, W)
        flat = sy * W + sx
        g = jax.vmap(lambda pp, fl: jnp.take(pp.reshape(-1), fl.reshape(-1))
                     .reshape(H, W))(p, flat)               # [B, H, W] u32
        r = (g & 0xFF).astype(jnp.float32)
        gg = ((g >> 8) & 0xFF).astype(jnp.float32)
        b = ((g >> 16) & 0xFF).astype(jnp.float32)
        mk = ((g >> 24) & 0xFF).astype(jnp.float32)
        rgb = jnp.stack([r, gg, b], axis=1)
        xo = ((rgb / 255.0 - mean) / std) * valid[:, None].astype(jnp.float32)
        return xo, mk * valid.astype(jnp.float32)

    im_u8b = jnp.take(imgs_u8, idx0, axis=0)
    mk_u8b = jnp.take(masks_u8, idx0, axis=0)
    t = chain_time(lambda i, x, m: geom_flat(i, x, m), args.steps, x_b, m_b,
                   probe=lambda o: jnp.sum(o[0, 0, :2, 0]))
    print(f"  geom variant: 1-D flat gather:  {t*1e3:8.2f} ms")
    t = chain_time(lambda i, a, b: geom_packed(i, a, b)[0], args.steps,
                   im_u8b, mk_u8b, probe=lambda o: jnp.sum(o[0, 0, :2, 0]))
    print(f"  geom variant: packed u32 gather:{t*1e3:8.2f} ms")

    if not args.with_step:
        return

    # ---- e2e: production stage-2 step alone vs assemble+step ----------
    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import (create_clip_params,
                                        init_adapter_params)
    from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn
    from aaclip_tpu.train.optim import make_image_optimizer
    from aaclip_tpu.train.steps import init_state, make_stage2_step

    cfg = get_config(args.model, S)
    acfg = AdapterConfig() if args.model != "tiny-test" else AdapterConfig(
        levels=(1, 2), image_adapt_until=1, text_adapt_until=1)
    policy = DtypePolicy.from_name("bf16")
    clip = create_clip_params(cfg, seed=0, policy=policy)
    adapters = init_adapter_params(jax.random.PRNGKey(1), cfg, acfg, policy)
    attn_fn = maybe_make_attn_fn(cfg, policy, differentiable=True)
    table = np.random.default_rng(1).standard_normal(
        (2, cfg.embed_dim, 2)).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    tx = make_image_optimizer()
    step = make_stage2_step(clip, cfg, acfg, tx, table, img_size=S,
                            policy=policy, attn_fn=attn_fn,
                            remat="selective", grad_accum=args.grad_accum)
    state = init_state(adapters["image"], tx)
    label = jnp.asarray(np.random.default_rng(2).integers(0, 2, B),
                        jnp.int32)
    cidx = jnp.asarray(np.random.default_rng(3).integers(0, 2, B),
                       jnp.int32)
    valid = jnp.ones((B,), jnp.float32)
    x_stage, m_stage = assemble_packed(0, imgs_u8, masks_u8, idx0)

    def step_alone(st):
        prev = None
        for i in range(args.steps):
            st, loss = step(st, x_stage, m_stage, label, cidx, valid)
            if prev is not None:
                float(prev)          # one-step-late fetch (production)
            prev = loss
        float(prev)
        return st

    def step_chained(st):
        prev = None
        for i in range(args.steps):
            x, m = assemble_packed(i, imgs_u8, masks_u8, idx0)
            st, loss = step(st, x, m, label, cidx, valid)
            if prev is not None:
                float(prev)
            prev = loss
        float(prev)
        return st

    print(f"e2e stage-2 (bf16, selective remat, grad_accum="
          f"{args.grad_accum}):")
    state = step_alone(state)                      # warm both programs
    t0 = time.perf_counter()
    state = step_alone(state)
    t_alone = (time.perf_counter() - t0) / args.steps
    print(f"  step alone (pre-staged input):  {t_alone*1e3:8.2f} ms"
          f"  ({B/t_alone:6.2f} img/s)")
    state = step_chained(state)
    t0 = time.perf_counter()
    state = step_chained(state)
    t_chain = (time.perf_counter() - t0) / args.steps
    print(f"  assemble + step chained:        {t_chain*1e3:8.2f} ms"
          f"  ({B/t_chain:6.2f} img/s)")
    print(f"  e2e input-assembly cost:        {(t_chain-t_alone)*1e3:8.2f}"
          f" ms/step")


if __name__ == "__main__":
    main()

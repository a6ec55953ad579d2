"""Micro-benchmark: where does the int8 win leak?

The isolated int8 matmul measured 1.44x bf16 (round 3), but end-to-end
``--precision int8`` inference is only ~1.05x bf16 (116.5 vs 111 maps/s).
This tool decomposes a ViT-L trunk block at the production shape
(batch 32 x 1370 tokens x width 1024) into its matmul/quant/attention
parts and times each in both precisions, so the next optimization (or a
documented negative result) rests on measurements:

* per-matmul: plain bf16 dot vs ops/quant.qdot (dynamic per-token
  activation quant + int8 MXU dot + rank-1 dequant epilogue) at the four
  block shapes (QKV, attn-out, MLP up, MLP down);
* dyn_quant alone (the extra HBM pass per quantized matmul input);
* the packed Pallas attention kernel (stays bf16 in the int8 path);
* the full residual block as wired by models/layers + the Pallas attn_fn
  (bf16 vs int8 param trees) — the end-to-end per-block truth.

Shapes are the reference's ViT-L-14-336 @ 518px geometry (reference
model/transformer.py:320-551; the int8 path itself is a TPU-native
extension with no reference counterpart).

Usage: python tools/microbench_int8.py [--steps 8] [--batch 32]
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

from aaclip_tpu.core.config import DtypePolicy
from aaclip_tpu.models import layers as L
from aaclip_tpu.ops import quant as Q
from aaclip_tpu.ops.flash_attention import attention_packed, make_attn_fn
from aaclip_tpu.utils.cache import enable_compilation_cache

D, F, HEADS, S = 1024, 4096, 16, 1370


def timeit(fn, *args, steps=8):
    """Relay-safe timing: chain iterations through a data dependency and
    fetch one scalar at the end (block_until_ready lies under axon).

    The warmup MUST include a ``bias=...`` call: the chained form is a
    different jit signature (bias=None vs array), and warming only the
    bias-less form put its compile inside the timed loop — the first
    capture of this tool reported 50-100x-too-slow bf16 numbers."""
    out = fn(*args)
    out = fn(*args, bias=out.astype(args[0].dtype)[..., :1])
    float(jnp.sum(out.astype(jnp.float32)[..., :1]))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args, bias=out.astype(args[0].dtype)[..., :1])
    float(jnp.sum(out.astype(jnp.float32)[..., :1]))
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    enable_compilation_cache()
    if jax.devices()[0].platform != "tpu":
        sys.exit("microbench_int8 measures int8-vs-bf16 MXU paths on the "
                 "real TPU (CPU has no int8 MXU; correctness is covered "
                 "by tests/test_quant.py)")

    policy = DtypePolicy.bf16()
    cd = policy.compute_dtype
    B = args.batch
    T = B * S  # tokens
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = (jax.random.normal(ks[0], (T, D), jnp.float32) * 0.5).astype(cd)
    h4 = (jax.random.normal(ks[1], (T, F), jnp.float32) * 0.5).astype(cd)

    shapes = {
        "qkv   [D,3D]": (x, jax.random.normal(ks[2], (D, 3 * D), jnp.float32) * 0.02),
        "out   [D,D] ": (x, jax.random.normal(ks[3], (D, D), jnp.float32) * 0.02),
        "mlp_up[D,4D]": (x, jax.random.normal(ks[4], (D, F), jnp.float32) * 0.02),
        "mlp_dn[4D,D]": (h4, jax.random.normal(ks[5], (F, D), jnp.float32) * 0.02),
    }

    print(f"tokens = {T} (batch {B} x seq {S}); steps = {args.steps}")
    print("\n-- per-matmul: bf16 dot vs int8 qdot "
          "(incl. dyn activation quant + dequant epilogue) --")
    tot_bf16 = tot_int8 = 0.0
    for name, (inp, w) in shapes.items():
        wq, ws = jax.jit(Q.quantize_weight)(w)
        wq, ws = jax.block_until_ready((wq, ws))
        w_cd = w.astype(cd)

        @jax.jit
        def dot_bf16(a, w=w_cd, *, bias=None):
            y = jnp.dot(a if bias is None else a + bias, w,
                        preferred_element_type=jnp.float32)
            return y.astype(cd)

        @jax.jit
        def dot_int8(a, wq=wq, ws=ws, *, bias=None):
            return Q.qdot(a if bias is None else a + bias, wq, ws).astype(cd)

        tb = timeit(dot_bf16, inp, steps=args.steps)
        ti = timeit(dot_int8, inp, steps=args.steps)
        tot_bf16 += tb
        tot_int8 += ti
        gf = 2 * inp.shape[0] * w.shape[0] * w.shape[1] / 1e9
        print(f"  {name}: bf16 {tb*1e3:7.2f} ms ({gf/tb/1e3:6.1f} TF/s)  "
              f"int8 {ti*1e3:7.2f} ms ({gf/ti/1e3:6.1f} TF/s)  "
              f"speedup {tb/ti:5.2f}x")
    print(f"  block matmul total: bf16 {tot_bf16*1e3:.2f} ms, "
          f"int8 {tot_int8*1e3:.2f} ms, speedup {tot_bf16/tot_int8:.2f}x")

    print("\n-- dyn_quant alone (the extra HBM pass per quantized input) --")
    for name, a in (("[T,D] ", x), ("[T,4D]", h4)):
        @jax.jit
        def quant_only(v, *, bias=None):
            q, m = Q.dyn_quant(v if bias is None else v + bias)
            return q.astype(jnp.float32) * m  # force both outputs live

        t = timeit(quant_only, a, steps=args.steps)
        gb = a.size * (2 + 1 + 4) / 1e9  # read bf16 + write int8 + f32 out
        print(f"  dyn_quant {name}: {t*1e3:7.2f} ms (~{gb/t:5.0f} GB/s "
              "apparent)")

    print("\n-- packed Pallas attention (bf16 in BOTH precision paths) --")
    qkv = (jax.random.normal(ks[6], (B, S, 3 * D), jnp.float32) * 0.5).astype(cd)

    @jax.jit
    def attn(a, *, bias=None):
        return attention_packed(a if bias is None else a + bias,
                                HEADS, valid_len=S)

    t_attn = timeit(attn, qkv, steps=args.steps)
    gf = 4 * B * S * S * D / 1e9
    print(f"  attention_packed: {t_attn*1e3:7.2f} ms ({gf/t_attn/1e3:6.1f} "
          "TF/s)")

    print("\n-- full residual block (as wired: Pallas attn_fn + XLA rest) --")
    xb = x.reshape(B, S, D)
    blk = {
        "ln_1": {"scale": 1 + jax.random.normal(ks[7], (D,)) * 0.02,
                 "bias": jnp.zeros((D,))},
        "ln_2": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "attn": {"w_qkv": shapes["qkv   [D,3D]"][1].astype(cd),
                 "b_qkv": jnp.zeros((3 * D,)),
                 "w_out": shapes["out   [D,D] "][1].astype(cd),
                 "b_out": jnp.zeros((D,))},
        "mlp": {"w_fc": shapes["mlp_up[D,4D]"][1].astype(cd),
                "b_fc": jnp.zeros((F,)),
                "w_proj": shapes["mlp_dn[4D,D]"][1].astype(cd),
                "b_proj": jnp.zeros((D,))},
    }
    attn_fn = make_attn_fn(HEADS, policy)
    act = L.policy_act(policy)

    def run_block(p):
        @jax.jit
        def f(a, *, bias=None):
            return L.residual_block(a if bias is None else a + bias, p,
                                    HEADS, act=act, policy=policy,
                                    attn_fn=attn_fn)

        return f

    t_bf16 = timeit(run_block(blk), xb, steps=args.steps)
    qblocks = jax.block_until_ready(
        jax.jit(Q.quantize_block_weights)(
            jax.tree.map(lambda a: a[None], blk)))
    qblk = jax.tree.map(lambda a: a[0], qblocks)
    t_int8 = timeit(run_block(qblk), xb, steps=args.steps)
    print(f"  block bf16: {t_bf16*1e3:7.2f} ms   int8: {t_int8*1e3:7.2f} ms"
          f"   speedup {t_bf16/t_int8:5.2f}x")
    print(f"  trunk extrapolation (x24): bf16 {24*t_bf16*1e3:.0f} ms, "
          f"int8 {24*t_int8*1e3:.0f} ms")


if __name__ == "__main__":
    main()

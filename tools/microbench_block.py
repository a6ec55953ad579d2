"""Micro-benchmark: one ViT-L trunk (24 identical blocks, batch 32,
seq 1370) — current path (Pallas attention + XLA LN/MLP/residual) vs the
fused-block Pallas path (ops/fused_block.py).

Usage: python tools/microbench_block.py [--steps 8] [--r_blk 512]
                                        [--mlp_f_blk 512] [--mode both]
Prints per-trunk ms and the max relative output deviation.
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
from aaclip_tpu.ops import fused_block as FB
from aaclip_tpu.ops.flash_attention import make_attn_fn
from aaclip_tpu.utils.cache import enable_compilation_cache

D, F, HEADS, LAYERS = 1024, 4096, 16, 24


def make_inputs(policy):
    ks = jax.random.split(jax.random.PRNGKey(0), 13)

    def n(k, shape, s=0.02):
        return jax.random.normal(k, shape, jnp.float32) * s

    p = {
        "ln_1": {"scale": 1 + n(ks[0], (D,)), "bias": n(ks[1], (D,))},
        "ln_2": {"scale": 1 + n(ks[2], (D,)), "bias": n(ks[3], (D,))},
        "attn": {"w_qkv": n(ks[4], (D, 3 * D)), "b_qkv": n(ks[5], (3 * D,)),
                 "w_out": n(ks[6], (D, D)), "b_out": n(ks[7], (D,))},
        "mlp": {"w_fc": n(ks[8], (D, F)), "b_fc": n(ks[9], (F,)),
                "w_proj": n(ks[10], (F, D)), "b_proj": n(ks[12], (D,))},
    }
    cd = policy.compute_dtype
    p = jax.tree.map(lambda a: a.astype(cd) if a.ndim >= 2 else a, p)
    x = jax.random.normal(ks[11], (32, 1370, D), jnp.float32).astype(cd)
    return x, p


def trunk(block):
    @jax.jit
    def run(x, p):
        def body(h, _):
            return block(h, p), None

        h, _ = jax.lax.scan(body, x, None, length=LAYERS)
        return h

    return run


def timeit(fn, x, p, steps):
    out = fn(x, p)
    float(jnp.sum(out[:, 0, :].astype(jnp.float32)))  # sync (relay)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(out.astype(x.dtype), p)
    float(jnp.sum(out[:, 0, :].astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--r_blk", type=int, default=512)
    ap.add_argument("--mlp_f_blk", type=int, default=512)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--mode", default="both",
                    choices=["both", "ref", "fused", "ops"])
    args = ap.parse_args()
    enable_compilation_cache()
    if jax.devices()[0].platform != "tpu":
        sys.exit("microbench_block measures Mosaic-vs-XLA on real TPUs; "
                 "interpret-mode CPU runs of these shapes take hours "
                 "(correctness on CPU is covered by tests/test_fused_block"
                 ".py).")
    policy = DtypePolicy.from_name(args.precision)
    act = L.policy_act(policy)
    x, p = make_inputs(policy)
    interp = False

    if args.mode == "ops":
        def scan24(op):
            @jax.jit
            def run(x, p):
                def body(h, _):
                    return op(h, p).astype(h.dtype)[..., :D], None

                h, _ = jax.lax.scan(body, x, None, length=LAYERS)
                return h

            return run

        pairs = {
            "ln_qkv  xla": lambda h, pp: L.linear(
                L.layer_norm(h, pp["ln_1"]),
                {"w": pp["attn"]["w_qkv"], "b": pp["attn"]["b_qkv"]}, policy),
            "ln_qkv  pls": lambda h, pp: FB.ln_linear(
                h, pp["ln_1"], pp["attn"]["w_qkv"], pp["attn"]["b_qkv"],
                policy=policy, r_blk=args.r_blk, interpret=interp),
            "outres  xla": lambda h, pp: h + L.linear(
                h, {"w": pp["attn"]["w_out"], "b": pp["attn"]["b_out"]},
                policy).astype(h.dtype),
            "outres  pls": lambda h, pp: FB.linear_residual(
                h, h, pp["attn"]["w_out"], pp["attn"]["b_out"], policy=policy,
                r_blk=args.r_blk, interpret=interp),
            "mlp     xla": lambda h, pp: h + L.mlp(
                L.layer_norm(h, pp["ln_2"]), pp["mlp"], act, policy),
            "mlp     pls": lambda h, pp: FB.mlp_fused(
                h, pp["ln_2"], pp["mlp"], act=act, policy=policy,
                r_blk=args.r_blk, f_blk=args.mlp_f_blk, interpret=interp),
        }
        for name, op in pairs.items():
            dt, _ = timeit(scan24(op), x, p, args.steps)
            print(f"{name}: {dt * 1e3:8.2f} ms /24-layer sweep")
        return

    results = {}
    if args.mode in ("both", "ref"):
        attn_fn = make_attn_fn(HEADS, policy, interpret=interp)
        ref = trunk(lambda h, pp: L.residual_block(
            h, pp, HEADS, act=act, policy=policy, attn_fn=attn_fn))
        dt, out_ref = timeit(ref, x, p, args.steps)
        results["ref"] = (dt, out_ref)
        print(f"ref   trunk: {dt * 1e3:8.2f} ms")
    if args.mode in ("both", "fused"):
        blk = FB.make_block_fn(HEADS, policy, act=act, r_blk=args.r_blk,
                               mlp_f_blk=args.mlp_f_blk, interpret=interp)
        fused = trunk(blk)
        dt, out_fused = timeit(fused, x, p, args.steps)
        results["fused"] = (dt, out_fused)
        print(f"fused trunk: {dt * 1e3:8.2f} ms "
              f"(r_blk={args.r_blk}, mlp_f_blk={args.mlp_f_blk})")
    if len(results) == 2:
        a = results["ref"][1].astype(jnp.float32)
        b = results["fused"][1].astype(jnp.float32)
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        speed = results["ref"][0] / results["fused"][0]
        print(f"speedup {speed:.3f}x   max-rel-dev {rel:.2e}")


if __name__ == "__main__":
    main()

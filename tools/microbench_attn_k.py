"""Micro-benchmark: can a head-packed K=128 layout beat the K=64
attention matmuls?  (The round-4 verdict's "single-chip endgame" probe.)

ViT-L attention has head_dim 64, so both attention matmuls underutilize
one MXU dimension at production shapes ([B*H, L, 64] geometry, L=1370):

* scores = Q @ K^T contracts over K=64 (half the 128-deep systolic
  array);
* out = P @ V has output width N=64 (half the 128 lanes).

The only SEMANTICS-PRESERVING way to fill the idle half is to pack TWO
heads block-diagonally — e.g. ``[Q_a | Q_b] ([L,128]) @ [[K_a^T, 0],
[0, K_b^T]] ([128, 2L]) = [Q_a K_a^T | Q_b K_b^T]`` — which doubles the
contraction depth but also doubles the issued MACs (the zero blocks are
multiplied like any other operand; systolic arrays don't skip zeros).
Analytically: 2x MACs at 2x utilization = the SAME wall time, so the
packing can win only if a K=64 matmul runs at materially LESS than half
the K=128 rate (per-pass overheads) — exactly what this tool measures:

1. naive    — batched [BH, L, 64] x [BH, 64, L] (the kernel's layout);
2. packed   — block-diagonal [BH/2, L, 128] x [BH/2, 128, 2L]
              (value-checked against naive at build time);
3. dense128 — [BH/2, L, 128] x [BH/2, 128, 2L] with REAL data — the
              ceiling the packed form pretends to reach (same issued
              MACs, all useful);
4. the P @ V side: naive [BH, L, L] x [BH, L, 64] vs the N=128 packed
              [BH/2, L, 2L] x [BH/2, 2L, 128] (block-diagonal P).

Reports wall time and achieved TFLOP/s (counting USEFUL flops only, so
"packed" honestly shows its wasted half).  Run on the chip:

    python tools/microbench_attn_k.py [--batch 32] [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aaclip_tpu.utils.platform import honor_env_platform

honor_env_platform()

import numpy as np
import jax
import jax.numpy as jnp

from aaclip_tpu.utils.cache import enable_compilation_cache

HEADS, HD, S = 16, 64, 1370


def timeit(fn, *args, steps=20):
    """Relay-safe: chain iterations through a data dependency and fetch
    one scalar at the end (block_until_ready lies under axon)."""
    out = fn(*args)
    out = fn(*args, chain=out)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args, chain=out)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps


def _chainable(matmul):
    """Wrap a 2-arg batched matmul so a scalar derived from the previous
    output perturbs the next input (the data-dependency chain)."""
    def fn(a, b, chain=None):
        if chain is not None:
            a = a + (jnp.sum(chain.astype(jnp.float32)) * 0).astype(a.dtype)
        return matmul(a, b)
    return jax.jit(fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=S)
    args = ap.parse_args()
    enable_compilation_cache()
    L = args.seq
    BH = args.batch * HEADS
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((BH, L, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BH, L, HD)), jnp.bfloat16)
    p = jnp.asarray(rng.standard_normal((BH, L, L)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BH, L, HD)), jnp.bfloat16)

    mm = _chainable(lambda a, b: jnp.einsum(
        "bld,bmd->blm", a, b, preferred_element_type=jnp.float32))
    mm_nt = _chainable(lambda a, b: jnp.einsum(
        "blk,bkm->blm", a, b, preferred_element_type=jnp.float32))

    # packed QK^T operands: Q pairs concatenated on d; K^T block-diagonal
    q2 = q.reshape(BH // 2, 2, L, HD).transpose(0, 2, 1, 3).reshape(
        BH // 2, L, 2 * HD)
    kt = k.transpose(0, 2, 1)                       # [BH, 64, L]
    kbd = np.zeros((BH // 2, 2 * HD, 2 * L), np.float32)
    kt_np = np.asarray(kt, np.float32)
    for i in range(BH // 2):
        kbd[i, :HD, :L] = kt_np[2 * i]
        kbd[i, HD:, L:] = kt_np[2 * i + 1]
    kbd = jnp.asarray(kbd, jnp.bfloat16)

    # value-check the packing on a tiny slice (fp32 reference)
    sc_ref = np.einsum("ld,md->lm", np.asarray(q[0], np.float32)[:8],
                       np.asarray(k[0], np.float32)[:8])
    sc_pack = np.einsum("lk,km->lm", np.asarray(q2[0], np.float32)[:8],
                        np.asarray(kbd[0], np.float32))[:, :8]
    np.testing.assert_allclose(sc_pack, sc_ref, rtol=1e-2, atol=1e-2)

    # dense K=128 ceiling: same shapes as packed, real data throughout
    kdense = jnp.asarray(rng.standard_normal((BH // 2, 2 * HD, 2 * L)),
                         jnp.bfloat16)

    # P @ V packed to N=128: P pairs concatenated on the contraction axis
    # (dense — [P_a | P_b], [L, 2L]) against a BLOCK-DIAGONAL V
    # ([[V_a, 0], [0, V_b]], [2L, 128]) gives [P_a V_a | P_b V_b] — both
    # heads correct, N=128 fully utilized, 2x issued MACs (V's zero
    # half), the exact mirror of the QK^T pack
    pcat = p.reshape(BH // 2, 2, L, L).transpose(0, 2, 1, 3).reshape(
        BH // 2, L, 2 * L)
    vbd = np.zeros((BH // 2, 2 * L, 2 * HD), np.float32)
    v_np = np.asarray(v, np.float32)
    for i in range(BH // 2):
        vbd[i, :L, :HD] = v_np[2 * i]
        vbd[i, L:, HD:] = v_np[2 * i + 1]
    vbd = jnp.asarray(vbd, jnp.bfloat16)
    # value-check the PV packing too
    pv_ref = np.einsum("lk,kd->ld", np.asarray(p[0], np.float32)[:8],
                       np.asarray(v[0], np.float32))
    pv_pack = np.einsum("lk,kd->ld", np.asarray(pcat[0], np.float32)[:8],
                        np.asarray(vbd[0], np.float32))[:, :HD]
    np.testing.assert_allclose(pv_pack, pv_ref, rtol=5e-2, atol=5e-1)

    flops_qk = 2 * BH * L * L * HD               # useful MACs x2
    flops_pv = 2 * BH * L * L * HD

    rows = []

    def report(name, t, useful_flops):
        tf = useful_flops / t / 1e12
        rows.append((name, t * 1e3, tf))
        print(f"{name:<26} {t * 1e3:8.2f} ms   {tf:7.2f} TF/s useful",
              flush=True)

    report("qk_naive_k64", timeit(mm, q, k, steps=args.steps), flops_qk)
    report("qk_packed_k128_blockdiag",
           timeit(mm_nt, q2, kbd, steps=args.steps), flops_qk)
    report("qk_dense_k128_ceiling",
           timeit(mm_nt, q2, kdense, steps=args.steps), 2 * flops_qk)
    report("pv_naive_n64", timeit(mm_nt, p, v, steps=args.steps), flops_pv)
    report("pv_packed_n128_blockdiag",
           timeit(mm_nt, pcat, vbd, steps=args.steps), flops_pv)

    import json
    print(json.dumps({"microbench_attn_k": [
        {"name": n, "ms": round(ms, 3), "useful_tflops": round(tf, 2)}
        for n, ms, tf in rows]}))


if __name__ == "__main__":
    main()

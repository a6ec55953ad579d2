"""Fused residual-block side kernels (Pallas TPU) — EXPERIMENTAL OPT-IN.

Measured verdict (round 2, tools/microbench_block.py on the chip): XLA's
dot emitters + elementwise fusions already run the non-attention trunk at
70-87% of bf16 peak *including* every LN/GELU/bias/residual pass, and the
Mosaic matmul pipelines here lose to them at every production shape
(whole fused trunk 0.75x XLA; docs/PERFORMANCE.md "Negative result").
These kernels are therefore NOT wired into any default path; they remain
as a correctness-tested (tests/test_fused_block.py) alternative for
future geometries where the trade-off may differ.

The fusion family runs a whole ViT residual block (reference
model/transformer.py:239-258) as Pallas calls around the packed attention
kernel so nothing but the block's input/output and the packed QKV ever
touches HBM:

* ``ln_linear``       — LayerNorm -> matmul -> +bias   (ln_1 -> packed QKV)
* ``linear_residual`` — matmul -> +bias -> +residual   (attention out-proj)
* ``mlp_fused``       — LayerNorm -> fc -> +bias -> GELU -> proj -> +bias
                        -> +residual, with the [rows, 4*D] hidden living
                        only in VMEM tiles (never written to HBM).

All kernels flatten [B, S, D] to rows (LayerNorm is per-row), tile rows x
output-features with the feature axis minormost (the row block stays
VMEM-resident across feature programs), and accumulate in fp32.  The
matmul honors the dtype policy via the shared ``_kdot`` 3-pass/6-pass
fp32 strategies; the production user is the bf16 fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aaclip_tpu.ops.flash_attention import _kdot, _kernel_precision, _round_up

_LN_EPS = 1e-5

_DOT2D = (((1,), (0,)), ((), ()))

_SQRT1_2 = 0.7071067811865476


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|abs err| <= 1.5e-7).

    Mosaic has no erf/erfc lowering (found by tools/tpu_selfcheck.py: the
    exact jax.nn.gelu lowers via erfc and fails pallas_call compilation on
    real TPUs), so exact-GELU activations inside kernels use this form.
    """
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(x < 0, -y, y)


def kernel_act(act):
    """Kernel-lowerable substitute for an activation: exact (erf) GELU is
    rewritten onto ``_erf_approx``; tanh/sigmoid forms lower natively."""
    from aaclip_tpu.models import layers as L

    if act is L.gelu:
        return lambda x: 0.5 * x * (1.0 + _erf_approx(x * _SQRT1_2))
    return act


def _pick_f_blk(F: int, cap: int = 1024) -> int:
    """Largest 128-multiple divisor of F not above ``cap``."""
    best = 0
    for m in range(128, cap + 1, 128):
        if F % m == 0:
            best = m
    if not best:
        raise ValueError(f"feature dim {F} has no 128-multiple tile")
    return best


def _ln_rows(x_ref, scale_ref, bias_ref, cd):
    """fp32-statistics LayerNorm of a [r_blk, D] block (models/layers.py
    layer_norm, reference model/transformer.py LayerNorm eps=1e-5)."""
    x32 = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    return y.astype(cd)


def _shrink_for_fp32(cd, r_blk: int, f_blk: int | None):
    """4-byte kernel inputs double every VMEM panel (and 'highest'
    precision runs 6-pass operand splits on top) — halve the tiles or
    Mosaic rejects the kernel with an HTTP 500 remote-compile error
    (measured: ln_linear/mlp_fused at r_blk 512 / f_blk 1024 fp32)."""
    if jnp.dtype(cd).itemsize >= 4:
        r_blk = min(r_blk, 256)
        f_blk = min(f_blk, 512) if f_blk else 512
    return r_blk, f_blk


def _flatten_rows(x, r_blk):
    B, S, D = x.shape
    R = B * S
    R_pad = _round_up(R, r_blk)
    xf = x.reshape(R, D)
    if R_pad != R:
        xf = jnp.pad(xf, [(0, R_pad - R), (0, 0)])
    return xf, R, R_pad


def _ln_linear_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref, o_ref, *,
                      cd, precision):
    y = _ln_rows(x_ref, lns_ref, lnb_ref, cd)
    h = _kdot(y, w_ref[...].astype(cd), _DOT2D, precision)
    h = h + b_ref[...].astype(jnp.float32)
    o_ref[...] = h.astype(o_ref.dtype)


def ln_linear(x: jax.Array, ln: dict, w: jax.Array, b: jax.Array, *,
              policy, r_blk: int = 512, f_blk: int | None = None,
              interpret: bool = False) -> jax.Array:
    """``layer_norm(x) @ w + b`` in one Pallas pass.

    x: [B, S, D]; w: [D, F]; returns [B, S, F] in x.dtype.  The LayerNorm
    is recomputed per feature program from the VMEM-resident row block —
    O(r_blk*D) VPU work versus an HBM round-trip of the normalized stream.
    """
    B, S, D = x.shape
    F = w.shape[1]
    cd = policy.compute_dtype
    kprec = _kernel_precision(cd, policy.precision)
    r_blk, f_blk = _shrink_for_fp32(cd, r_blk, f_blk)
    if f_blk is None or F % f_blk:
        f_blk = _pick_f_blk(F, f_blk or 1024)
    xf, R, R_pad = _flatten_rows(x, r_blk)
    grid = (R_pad // r_blk, F // f_blk)
    kernel = functools.partial(_ln_linear_kernel, cd=cd, precision=kprec)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, F), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_blk, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, f_blk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_blk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_blk, f_blk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * R_pad * D * F,
            bytes_accessed=(R_pad * D + D * F + R_pad * F) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, ln["scale"].reshape(1, D), ln["bias"].reshape(1, D),
      w, b.reshape(1, F))
    return out[:R].reshape(B, S, F)


def _linear_residual_kernel(res_ref, y_ref, w_ref, b_ref, o_ref, *,
                            cd, precision):
    h = _kdot(y_ref[...].astype(cd), w_ref[...].astype(cd), _DOT2D, precision)
    h = h + b_ref[...].astype(jnp.float32)
    o_ref[...] = (res_ref[...].astype(jnp.float32) + h).astype(o_ref.dtype)


def linear_residual(res: jax.Array, y: jax.Array, w: jax.Array,
                    b: jax.Array, *, policy, r_blk: int = 512,
                    f_blk: int | None = None,
                    interpret: bool = False) -> jax.Array:
    """``res + y @ w + b`` in one Pallas pass (attention out-projection +
    residual add; reference model/transformer.py:253-255)."""
    B, S, D_in = y.shape
    F = w.shape[1]
    cd = policy.compute_dtype
    kprec = _kernel_precision(cd, policy.precision)
    r_blk, f_blk = _shrink_for_fp32(cd, r_blk, f_blk)
    if f_blk is None or F % f_blk:
        f_blk = _pick_f_blk(F, f_blk or 1024)
    yf, R, R_pad = _flatten_rows(y, r_blk)
    rf, _, _ = _flatten_rows(res, r_blk)
    grid = (R_pad // r_blk, F // f_blk)
    kernel = functools.partial(_linear_residual_kernel, cd=cd, precision=kprec)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, F), res.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_blk, f_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, D_in), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D_in, f_blk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_blk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_blk, f_blk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * R_pad * D_in * F,
            bytes_accessed=(2 * R_pad * D_in + D_in * F + R_pad * F)
            * res.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rf, yf, w, b.reshape(1, F))
    return out[:R].reshape(B, S, F)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, wfc_ref, bfc_ref, wpj_ref, bpj_ref,
                o_ref, ln_s, acc_s, *, cd, act, precision):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        ln_s[...] = _ln_rows(x_ref, lns_ref, lnb_ref, cd)
        acc_s[...] = jnp.zeros_like(acc_s)

    h = _kdot(ln_s[...], wfc_ref[...].astype(cd), _DOT2D, precision)
    h = act(h + bfc_ref[...].astype(jnp.float32))
    acc_s[...] += _kdot(h.astype(cd), wpj_ref[...].astype(cd), _DOT2D,
                        precision)

    @pl.when(j == nj - 1)
    def _():
        o_ref[...] = (x_ref[...].astype(jnp.float32) + acc_s[...]
                      + bpj_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def mlp_fused(x: jax.Array, ln: dict, mlp: dict, *, act, policy,
              r_blk: int = 512, f_blk: int = 512,
              interpret: bool = False) -> jax.Array:
    """``x + proj(act(fc(layer_norm(x))))`` in one Pallas pass.

    The [rows, 4*D] hidden exists only as [r_blk, f_blk] VMEM tiles: the
    kernel sweeps the hidden dimension minormost, accumulating partial
    projection products into an fp32 scratch, and emits the residual-added
    block output once per row block.  Versus the XLA lowering this skips
    HBM materialization of the normalized stream, the fp32 fc output, the
    GELU'd hidden, and the fp32 proj output (reference MLP:
    model/transformer.py:247-252; jnp equivalent models/layers.py mlp).
    """
    B, S, D = x.shape
    F = mlp["w_fc"].shape[1]
    cd = policy.compute_dtype
    kprec = _kernel_precision(cd, policy.precision)
    r_blk, f_blk = _shrink_for_fp32(cd, r_blk, f_blk)
    if F % f_blk:
        f_blk = _pick_f_blk(F, f_blk)
    xf, R, R_pad = _flatten_rows(x, r_blk)
    grid = (R_pad // r_blk, F // f_blk)
    kernel = functools.partial(_mlp_kernel, cd=cd, act=kernel_act(act),
                               precision=kprec)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, D), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_blk, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, f_blk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_blk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_blk, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_blk, D), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((r_blk, D), cd),          # normalized row block
            pltpu.VMEM((r_blk, D), jnp.float32),  # projection accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * R_pad * D * F,
            bytes_accessed=(2 * R_pad * D + 2 * D * F) * x.dtype.itemsize,
            transcendentals=R_pad * F,
        ),
        interpret=interpret,
    )(xf, ln["scale"].reshape(1, D), ln["bias"].reshape(1, D),
      mlp["w_fc"], mlp["b_fc"].reshape(1, F),
      mlp["w_proj"], mlp["b_proj"].reshape(1, D))
    return out[:R].reshape(B, S, D)


def fused_block_supported(cfg) -> bool:
    """Head geometry + widths the fused block kernels can tile: everything
    the packed attention supports, plus 128-multiple model/MLP widths."""
    from aaclip_tpu.ops.flash_attention import pallas_attention_supported

    v = cfg.vision
    head_dim = v.width // v.heads
    return (pallas_attention_supported(v.heads, head_dim)
            and v.width % 128 == 0
            and int(v.width * v.mlp_ratio) % 128 == 0)


def make_block_fn(num_heads: int, policy, *, act, vv: bool = False,
                  q_blk: int | None = None, r_blk: int = 512,
                  mlp_f_blk: int = 512, interpret: bool = False):
    """Whole-residual-block override for models/layers.residual_block:
    receives the UN-normalized residual stream and the stacked block params,
    returns the block output.  Four Pallas calls, zero XLA elementwise
    passes: ln_linear(QKV) -> attention_packed -> linear_residual(out-proj)
    -> mlp_fused.  Inference-only (no custom VJP); training paths keep the
    jnp block + differentiable attention kernel.
    """
    from aaclip_tpu.ops.flash_attention import attention_packed

    def block_fn(x: jax.Array, p: dict) -> jax.Array:
        B, L, Dm = x.shape
        ap = p["attn"]
        if vv:
            proj = ln_linear(x, p["ln_1"], ap["w_qkv"][:, 2 * Dm:],
                             ap["b_qkv"][2 * Dm:], policy=policy,
                             r_blk=r_blk, interpret=interpret)
            a = attention_packed(proj, num_heads, valid_len=L, vv=True,
                                 q_blk=q_blk, packed_sections=1,
                                 precision=policy.precision,
                                 interpret=interpret)
        else:
            qkv = ln_linear(x, p["ln_1"], ap["w_qkv"], ap["b_qkv"],
                            policy=policy, r_blk=r_blk, interpret=interpret)
            a = attention_packed(qkv, num_heads, valid_len=L, q_blk=q_blk,
                                 precision=policy.precision,
                                 interpret=interpret)
        x = linear_residual(x, a, ap["w_out"], ap["b_out"], policy=policy,
                            r_blk=r_blk, interpret=interpret)
        return mlp_fused(x, p["ln_2"], p["mlp"], act=act, policy=policy,
                         r_blk=r_blk, f_blk=mlp_f_blk, interpret=interpret)

    return block_fn


def maybe_make_block_fn(cfg, policy, *, vv: bool = False):
    """Gate for the EXPERIMENTAL fused inference block: TPU backend,
    tileable geometry, and the bf16 fast path only (the fp32 parity paths
    keep the XLA block so their numerics never change; CLAUDE.md
    invariant).  Not called by any CLI — the measured default is the XLA
    block (see module docstring)."""
    if jax.devices()[0].platform != "tpu":
        return None
    if not fused_block_supported(cfg):
        return None
    if policy.compute_dtype != jnp.bfloat16:
        return None
    if policy.quant_int8:
        # int8 also rides bf16 compute, but the fused kernels read weight
        # refs raw — quantized int8 codes without their dequant scales
        # would compute garbage
        return None
    from aaclip_tpu.models import layers as L

    return make_block_fn(cfg.vision.heads, policy,
                         act=L.config_act(cfg, policy), vv=vv)

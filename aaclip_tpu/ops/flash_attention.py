"""Pallas TPU attention kernels for the ViT's fixed-length sequences.

Shape regime (ViT-L/14-336 @ 518px): seq 1370 (37^2 patches + CLS), 16
heads, head_dim 64, no causal mask.  Two kernel families:

* ``attention_kernel`` — classic [B, H, S, D] layout, full K/V per program
  (the whole key row fits VMEM at this length, so no online softmax is
  needed); K/V stay VMEM-resident across q-blocks via constant index maps.
* ``attention_packed`` — the production path: q/k/v are FEATURE-OFFSET
  VIEWS into the packed [B, S, 3*D_model] projection (three BlockSpecs into
  the same array), and the output is written token-major.  Zero head
  transposes; softmax normalization deferred to the [q_blk, D] output;
  q_blk auto-chosen to minimize lane padding (1370 -> 1408, not 1536).
  ``attention_packed_diff`` adds a custom VJP whose backward kernel
  recomputes the softmax panel per q-block and accumulates dK/dV in fp32
  VMEM — nothing [S, S]-sized ever reaches HBM in either direction.

The V-V CLIP-Surgery variant (q = k = v) reuses the same kernels with all
three views pointed at the value section.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aaclip_tpu.core.config import DtypePolicy


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_precision(dtype, precision):
    """Dot strategy for 4-byte kernel inputs.  Mosaic only lowers DEFAULT
    and HIGHEST natively; the 3-pass F32_AS_3BF16 scheme ("high") is
    implemented manually in ``_kdot``.  bf16 inputs always run
    single-pass."""
    if jnp.dtype(dtype).itemsize < 4 or precision is None:
        return None
    name = str(precision).lower()
    return "high" if "high" == name.removeprefix("precision.") else "highest"


def _kdot(a, b, dims, precision):
    """dot_general inside the kernel honoring the fp32 precision request.

    "high" = manual 3-pass bf16 split (hi*hi + hi*lo + lo*hi, fp32
    accumulation) — exactly XLA's F32_AS_3BF16, which Mosaic cannot lower
    natively; "highest" lowers to the native 6-pass form.
    """
    if precision == "high":
        a32 = a.astype(jnp.float32)
        b32 = b.astype(jnp.float32)
        a_hi = a32.astype(jnp.bfloat16)
        b_hi = b32.astype(jnp.bfloat16)
        a_lo = (a32 - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_lo = (b32 - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(x, y, dims,
                                       preferred_element_type=jnp.float32)

        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int,
                 bh_blk: int, precision=None):
    for j in range(bh_blk):  # static unroll over heads in this block
        q = q_ref[j]                      # [q_blk, D]
        k = k_ref[j]                      # [S_pad, D]
        v = v_ref[j]
        s = _kdot(q, k, (((1,), (1,)), ((), ())),
                  precision) * scale      # [q_blk, S_pad]
        if valid_len < k.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid_len, s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        # defer normalization to the [q_blk, D] output (cheaper than
        # dividing the full [q_blk, S_pad] panel)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = _kdot(p.astype(v.dtype), v, (((1,), (0,)), ((), ())), precision)
        o_ref[j] = (o / l).astype(o_ref.dtype)


def attention_kernel(q: jax.Array, k: jax.Array, v: jax.Array,
                     valid_len: int, *, q_blk: int = 512, bh_blk: int = 2,
                     precision=None, interpret: bool = False) -> jax.Array:
    """Batched multi-head attention via the Pallas kernel.

    q/k/v: [B, H, S, D]; ``valid_len`` <= S is the real sequence length
    (keys past it are masked).  ``bh_blk`` heads are processed per program
    (statically unrolled) to amortize grid/DMA overhead.  Returns
    [B, H, S, D] (rows past valid_len are garbage; caller slices).
    """
    B, H, S, D = q.shape
    scale = D ** -0.5
    S_pad = _round_up(S, q_blk)
    if S_pad != S:
        pad = [(0, 0), (0, 0), (0, S_pad - S), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    BH = B * H
    while bh_blk > 1 and BH % bh_blk:
        bh_blk //= 2
    qf = q.reshape(BH, S_pad, D)
    kf = k.reshape(BH, S_pad, D)
    vf = v.reshape(BH, S_pad, D)

    grid = (BH // bh_blk, S_pad // q_blk)
    kernel = functools.partial(_attn_kernel, scale=scale,
                               valid_len=valid_len, bh_blk=bh_blk,
                               precision=_kernel_precision(q.dtype, precision))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, S_pad, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bh_blk, q_blk, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh_blk, S_pad, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh_blk, S_pad, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh_blk, q_blk, D), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * S_pad * S_pad * D,
            bytes_accessed=(3 * BH * S_pad * D + BH * S_pad * D) * q.dtype.itemsize,
            transcendentals=BH * S_pad * S_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(B, H, S_pad, D)
    return out[:, :, :S, :]


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                   valid_len: int, heads_per_blk: int, hd: int, vv: bool,
                   precision=None):
    """Attention over packed-QKV feature sections.

    q_ref: [1, q_blk, heads_per_blk*hd]; k_ref/v_ref: [1, S_pad, ...] —
    feature slices of the SAME packed [B, S, 3*D_model] array, selected by
    the BlockSpec index maps.  ``vv=True`` uses (v, v, v) (CLIP-Surgery).
    """
    del vv  # the BlockSpec index maps already redirect q/k to the value
    # section in V-V mode; q stays q-block-shaped either way
    for j in range(heads_per_blk):
        sl = slice(j * hd, (j + 1) * hd)
        vs = v_ref[0][:, sl]
        qs = q_ref[0][:, sl]
        ks = k_ref[0][:, sl]
        s = _kdot(qs, ks, (((1,), (1,)), ((), ())), precision) * scale
        if valid_len < ks.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid_len, s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = _kdot(p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())), precision)
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def _auto_q_blk(S: int, itemsize: int = 2,
                kernel_precision=None) -> tuple[int, int]:
    """(q_blk, S_pad) minimizing pad waste: pad to the next 128 lanes, then
    halve until the q panel is a reasonable size.  4-byte inputs at native
    6-pass ("highest") precision keep double-width fp32 operand panels in
    VMEM, so they get a smaller cap; the manual 3-pass path ("high")
    operates on bf16 splits and fits the full-width panels."""
    S_pad = _round_up(S, 128)
    cap = 384 if (itemsize >= 4 and kernel_precision == "highest") else 768
    q_blk = S_pad
    while q_blk > cap and q_blk % 2 == 0:
        q_blk //= 2
    return q_blk, S_pad


def attention_packed(qkv: jax.Array, num_heads: int, valid_len: int, *,
                     vv: bool = False, heads_per_blk: int = 2,
                     q_blk: int | None = None, packed_sections: int = 3,
                     precision=None, interpret: bool = False) -> jax.Array:
    """Attention directly on the packed QKV projection — zero head
    transposes.

    qkv: [B, S, 3*D_model] with bias already added.  Three BlockSpecs view
    the same array at the q / k / v feature offsets of this program's head
    group, and the output [B, S, D_model] is written token-major, ready for
    the out-projection matmul.  Removes the four [B, H, S, hd] relayouts of
    the classic formulation (~2 full activation copies per layer).

    In the V-V mode only the v section is ever read, and the q/k specs
    point at it too (no wasted DMA).
    """
    B, S, three_dm = qkv.shape
    dm = three_dm // packed_sections
    hd = dm // num_heads
    scale = hd ** -0.5
    while heads_per_blk > 1 and num_heads % heads_per_blk:
        heads_per_blk //= 2
    kprec = _kernel_precision(qkv.dtype, precision)
    if q_blk is None:
        q_blk, S_pad = _auto_q_blk(S, qkv.dtype.itemsize, kprec)
    else:
        S_pad = _round_up(S, q_blk)
    if S_pad != S:
        qkv = jnp.pad(qkv, [(0, 0), (0, S_pad - S), (0, 0)])
    n_hblk = num_heads // heads_per_blk
    fw = heads_per_blk * hd  # feature width per section per program

    grid = (B, n_hblk, S_pad // q_blk)
    kernel = functools.partial(
        _packed_kernel, scale=scale, valid_len=valid_len,
        heads_per_blk=heads_per_blk, hd=hd, vv=vv, precision=kprec)
    # feature-block index: q section = h, k = n_hblk + h, v = v_base + h
    v_base = (packed_sections - 1) * n_hblk
    q_off = v_base if vv else 0
    k_off = v_base if vv else min(n_hblk, v_base)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S_pad, dm), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_blk, fw),
                         lambda b, h, qi: (b, qi, q_off + h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, fw),
                         lambda b, h, qi: (b, 0, k_off + h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, fw),
                         lambda b, h, qi: (b, 0, v_base + h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_blk, fw), lambda b, h, qi: (b, qi, h),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * S_pad * S_pad * hd,
            bytes_accessed=4 * B * S_pad * dm * qkv.dtype.itemsize,
            transcendentals=B * num_heads * S_pad * S_pad,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out[:, :S, :]


def _packed_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                       *, scale: float, valid_len: int, heads_per_blk: int,
                       hd: int, precision=None):
    """Backward for the packed attention (one q-block per program).

    Standard attention VJP with the full key row per program:
      dV = P^T dO;  dP = dO V^T;  dS = P (dP - rowsum(dP P));
      dQ = scale dS K;  dK = scale dS^T Q.
    dK/dV blocks are revisited across the (minormost) q grid axis and
    accumulated in fp32 VMEM.
    """
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    for j in range(heads_per_blk):
        sl = slice(j * hd, (j + 1) * hd)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        # do is consumed only at v.dtype (the fp32 work happens in the
        # _kdot accumulators / the fp32 p panel above)
        do = do_ref[0][:, sl].astype(v.dtype)
        s = _kdot(q, k, (((1,), (1,)), ((), ())), precision) * scale
        if valid_len < k.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid_len, s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)      # [q_blk, S_pad]
        pc = p.astype(v.dtype)
        dv_ref[0, :, sl] += _kdot(pc, do,
                                  (((0,), (0,)), ((), ())), precision)
        dp = _kdot(do, v, (((1,), (1,)), ((), ())),
                   precision)                           # [q_blk, S_pad]
        dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - dsum) * scale).astype(q.dtype)
        dq_ref[0, :, sl] = _kdot(ds, k, (((1,), (0,)), ((), ())),
                                 precision).astype(dq_ref.dtype)
        dk_ref[0, :, sl] += _kdot(ds, q, (((0,), (0,)), ((), ())), precision)


def _attention_packed_bwd_impl(qkv, d_out, num_heads: int, valid_len: int,
                               q_blk, precision, interpret: bool):
    B, S, three_dm = qkv.shape
    dm = three_dm // 3
    hd = dm // num_heads
    scale = hd ** -0.5
    heads_per_blk = 2 if num_heads % 2 == 0 else 1
    kprec = _kernel_precision(qkv.dtype, precision)
    if q_blk is None:
        q_blk, S_pad = _auto_q_blk(S, qkv.dtype.itemsize, kprec)
        if qkv.dtype.itemsize >= 4:
            q_blk //= 2  # bwd holds ~2x the forward's panels
    else:
        S_pad = _round_up(S, q_blk)
    if S_pad != S:
        qkv = jnp.pad(qkv, [(0, 0), (0, S_pad - S), (0, 0)])
        d_out = jnp.pad(d_out, [(0, 0), (0, S_pad - S), (0, 0)])
    n_hblk = num_heads // heads_per_blk
    fw = heads_per_blk * hd

    grid = (B, n_hblk, S_pad // q_blk)
    kernel = functools.partial(
        _packed_bwd_kernel, scale=scale, valid_len=valid_len,
        heads_per_blk=heads_per_blk, hd=hd, precision=kprec)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, S_pad, dm), qkv.dtype),     # dQ
            jax.ShapeDtypeStruct((B, S_pad, dm), jnp.float32),   # dK (accum)
            jax.ShapeDtypeStruct((B, S_pad, dm), jnp.float32),   # dV (accum)
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_blk, fw), lambda b, h, qi: (b, qi, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, fw),
                         lambda b, h, qi, n=n_hblk: (b, 0, n + h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, fw),
                         lambda b, h, qi, n=n_hblk: (b, 0, 2 * n + h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_blk, fw), lambda b, h, qi: (b, qi, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, q_blk, fw), lambda b, h, qi: (b, qi, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, fw), lambda b, h, qi: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, fw), lambda b, h, qi: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, d_out)
    d_qkv = jnp.concatenate(
        [dq.astype(qkv.dtype), dk.astype(qkv.dtype), dv.astype(qkv.dtype)],
        axis=-1)
    return d_qkv[:, :S, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def attention_packed_diff(qkv: jax.Array, num_heads: int, valid_len: int,
                          q_blk=None, precision=None,
                          interpret: bool = False) -> jax.Array:
    """Differentiable packed attention (standard mode): forward is
    ``attention_packed``, backward is a matching Pallas kernel pair."""
    return attention_packed(qkv, num_heads, valid_len, q_blk=q_blk,
                            precision=precision, interpret=interpret)


def _apd_fwd(qkv, num_heads, valid_len, q_blk, precision, interpret):
    out = attention_packed(qkv, num_heads, valid_len, q_blk=q_blk,
                           precision=precision, interpret=interpret)
    return out, qkv


def _apd_bwd(num_heads, valid_len, q_blk, precision, interpret, qkv, d_out):
    return (_attention_packed_bwd_impl(qkv, d_out, num_heads, valid_len,
                                       q_blk, precision, interpret),)


attention_packed_diff.defvjp(_apd_fwd, _apd_bwd)


def pallas_attention_supported(num_heads: int, head_dim: int) -> bool:
    """Whether the packed kernels can tile this head geometry.

    Mosaic requires each block's minor dimension to be a multiple of the
    128-lane register width (or span the whole array, which the packed
    feature-section views never do), so the per-program section width —
    ``heads_per_blk * head_dim`` after the kernel's head-count adjustment —
    must divide by 128.  ViT-L/-B geometries (head_dim 64, even head count)
    pass; tiny test models (head_dim 16) fall back to XLA attention.
    """
    heads_per_blk = 2 if num_heads % 2 == 0 else 1
    return (heads_per_blk * head_dim) % 128 == 0


def maybe_make_attn_fn(cfg, policy: DtypePolicy = DtypePolicy(), *,
                       vv: bool = False, differentiable: bool = False):
    """``make_attn_fn`` when the backend is a TPU and the model's head
    geometry tiles the Mosaic lane width; ``None`` (XLA attention)
    otherwise.  The single gate used by every CLI/tool."""
    if jax.devices()[0].platform != "tpu":
        return None
    head_dim = cfg.vision.width // cfg.vision.heads
    if not pallas_attention_supported(cfg.vision.heads, head_dim):
        return None
    return make_attn_fn(cfg.vision.heads, policy, vv=vv,
                        differentiable=differentiable)


def make_attn_fn(num_heads: int, policy: DtypePolicy = DtypePolicy(),
                 *, vv: bool = False, q_blk: int | None = None,
                 differentiable: bool = False, interpret: bool = False):
    """Attention override for models/layers.residual_block: receives the
    pre-normalized residual stream and the packed-QKV params, returns the
    projected attention output — identical math to layers.attention with
    the packed Pallas kernel in the middle (no head transposes).

    The V-V variant projects only the value section of the packed weights.
    ``differentiable=True`` routes through the custom-VJP variant (training
    steps); the default forward-only form is cheaper to trace.
    """
    if vv and differentiable:
        # no vv custom-VJP exists (stage-1 surgery features are grad-free
        # by design); silently dropping the flag would leave a
        # non-differentiable pallas_call in a training graph
        raise ValueError("the V-V Pallas kernel has no differentiable "
                         "variant — stage-1 feature extraction is "
                         "gradient-free (reference train.py:75-81)")

    def attn_fn(x: jax.Array, p: dict) -> jax.Array:
        B, L, Dm = x.shape
        cd = policy.compute_dtype
        xc = x.astype(cd)
        quantized = p["w_qkv"].dtype == jnp.int8
        if quantized:  # --precision int8 (ops/quant.py): the projections
            from aaclip_tpu.ops.quant import qdot  # take the int8 MXU path;
            # the Pallas kernel itself stays in the compute dtype
        if vv:
            if quantized:
                proj = qdot(x, p["w_qkv"][:, 2 * Dm:],
                            p["w_qkv_s"][2 * Dm:])
            else:
                w_v = p["w_qkv"][:, 2 * Dm:]
                proj = jnp.dot(xc, w_v.astype(cd),
                               preferred_element_type=jnp.float32,
                               precision=policy.precision)
            proj = (proj + p["b_qkv"][2 * Dm:].astype(jnp.float32)).astype(cd)
            out = attention_packed(proj, num_heads, valid_len=L, vv=True,
                                   q_blk=q_blk, packed_sections=1,
                                   precision=policy.precision,
                                   interpret=interpret)
        else:
            from jax.ad_checkpoint import checkpoint_name

            if quantized:
                qkv = qdot(x, p["w_qkv"], p["w_qkv_s"])
            else:
                qkv = jnp.dot(xc, p["w_qkv"].astype(cd),
                              preferred_element_type=jnp.float32,
                              precision=policy.precision)
            qkv = (qkv + p["b_qkv"].astype(jnp.float32)).astype(cd)
            # saved under selective remat: the custom-VJP backward kernel
            # consumes qkv directly, so saving it skips the re-projection
            qkv = checkpoint_name(qkv, "attn_qkv")
            if differentiable:
                out = attention_packed_diff(qkv, num_heads, L, q_blk,
                                            policy.precision, interpret)
            else:
                out = attention_packed(qkv, num_heads, valid_len=L,
                                       q_blk=q_blk,
                                       precision=policy.precision,
                                       interpret=interpret)
        if quantized:
            out = qdot(out, p["w_out"], p["w_out_s"])
        else:
            out = jnp.dot(out.astype(cd), p["w_out"].astype(cd),
                          preferred_element_type=jnp.float32,
                          precision=policy.precision)
        out = out + p["b_out"].astype(jnp.float32)
        return out.astype(x.dtype)

    return attn_fn

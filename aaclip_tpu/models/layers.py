"""Functional transformer primitives shared by the vision and text towers.

Parameters are plain dict pytrees; every function is pure and jit-friendly.
Linear weights use the JAX convention ``[in_features, out_features]`` (the
checkpoint converter transposes torch's ``[out, in]``).

Numerics match the reference (fp32 OpenCLIP, model/transformer.py):
 * LayerNorm eps 1e-5, biased variance, fp32 statistics,
 * exact erf GELU (quick_gelu=False path, model/model.py:84),
 * pre-LN residual blocks with packed-QKV multi-head attention,
 * the CLIP-Surgery "V-V" attention variant where queries and keys are both
   replaced by values (model/transformer.py:125-152).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from aaclip_tpu.core.config import DtypePolicy

_LN_EPS = 1e-5


def layer_norm(x: jax.Array, p: dict) -> jax.Array:
    """LayerNorm over the last axis with fp32 statistics."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + _LN_EPS)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU."""
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """tanh-approximate GELU (fast path; |err| < 3e-3)."""
    return jax.nn.gelu(x, approximate=True)


def policy_act(policy: DtypePolicy):
    """GELU variant selected by the dtype policy."""
    return gelu_tanh if policy.fast_act else gelu


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def config_act(cfg, policy: DtypePolicy):
    """Activation selected by model config + dtype policy.

    A config with ``quick_gelu: true`` (OpenAI pre-ViT-L checkpoints;
    reference model/model.py:84, transformer.py:46-49) uses QuickGELU in
    both precisions — it is already a cheap sigmoid form, so the policy's
    fast-act preference does not apply.  Otherwise erf GELU (fp32 parity)
    or tanh GELU (bf16 fast path) by policy.
    """
    if getattr(cfg, "quick_gelu", False):
        return quick_gelu
    return policy_act(policy)


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def linear(x: jax.Array, p: dict, policy: DtypePolicy = DtypePolicy()) -> jax.Array:
    """``x @ w (+ b)`` with the policy's compute dtype and fp32 accumulation.

    int8 weight leaves (``--precision int8``, ops/quant.py) take the
    dynamically-quantized MXU path: per-token activation quant, int32
    accumulation, rank-1 dequant."""
    if p["w"].dtype == jnp.int8:
        from aaclip_tpu.ops.quant import qdot
        y = qdot(x, p["w"], p["w_s"])
    else:
        cd = policy.compute_dtype
        y = jnp.dot(x.astype(cd), p["w"].astype(cd), preferred_element_type=jnp.float32, precision=policy.precision)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y


def attention(
    x: jax.Array,
    p: dict,
    num_heads: int,
    *,
    mask: Optional[jax.Array] = None,
    vv: bool = False,
    policy: DtypePolicy = DtypePolicy(),
) -> jax.Array:
    """Multi-head self-attention with a packed QKV projection.

    ``vv=True`` selects the CLIP-Surgery value-value variant: q and k are
    replaced by v before the score matmul (reference
    model/transformer.py:139-149); only the V slice of the packed projection
    is then needed.
    """
    B, L, D = x.shape
    hd = D // num_heads
    scale = hd ** -0.5
    cd = policy.compute_dtype
    xc = x.astype(cd)

    quantized = p["w_qkv"].dtype == jnp.int8
    if quantized:
        from aaclip_tpu.ops.quant import qdot

    if vv:
        if quantized:
            v = qdot(x, p["w_qkv"][:, 2 * D:], p["w_qkv_s"][2 * D:])
        else:
            w_v = p["w_qkv"][:, 2 * D :]
            v = jnp.dot(xc, w_v.astype(cd), preferred_element_type=jnp.float32, precision=policy.precision)
        v = v + p["b_qkv"][2 * D :].astype(jnp.float32)
        v = v.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
        q = k = v
    else:
        if quantized:
            qkv = qdot(x, p["w_qkv"], p["w_qkv_s"])
        else:
            qkv = jnp.dot(xc, p["w_qkv"].astype(cd), preferred_element_type=jnp.float32, precision=policy.precision)
        qkv = qkv + p["b_qkv"].astype(jnp.float32)
        qkv = qkv.reshape(B, L, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

    scores = (
        jnp.einsum("bhqd,bhkd->bhqk", q.astype(cd), k.astype(cd),
                   preferred_element_type=jnp.float32, precision=policy.precision)
        * scale
    )
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(cd), v.astype(cd),
        preferred_element_type=jnp.float32, precision=policy.precision,
    )
    out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
    if quantized:
        out = qdot(out, p["w_out"], p["w_out_s"])
    else:
        out = jnp.dot(out.astype(cd), p["w_out"].astype(cd),
                      preferred_element_type=jnp.float32, precision=policy.precision)
    out = out + p["b_out"].astype(jnp.float32)
    return out.astype(x.dtype)


def attention_vv_batch(x: jax.Array, p: dict, num_heads: int, *,
                       policy: DtypePolicy = DtypePolicy(),
                       valid=None) -> jax.Array:
    """Reference-exact CLIP-Surgery V-V attention: attends across the BATCH
    at each spatial position.

    The reference's surgery ``Attention`` module assumes batch-first input
    (``B, N, C = q_x.shape``, reference model/transformer.py:126) but the
    tower feeds it seq-first LND tensors (model/transformer.py:528), so in
    the reference the "V-V attention" softmax actually runs over the batch
    samples at each position — stage-1 supervision features mix across the
    batch and depend on its composition (measured: ~10% relative feature
    shift from swapping one batchmate; see docs/PARITY.md "V-V attention
    layout quirk").  This function reproduces that behavior exactly; the
    (arguably intended) spatial form is ``attention(vv=True)``.

    FLOP note: per position the score matrix is [batch, batch] — ~L/B times
    cheaper than spatial V-V at ViT-L shapes, so no Pallas kernel is needed.
    """
    B, L, D = x.shape
    hd = D // num_heads
    scale = hd ** -0.5
    cd = policy.compute_dtype
    xc = x.astype(cd)
    quantized = p["w_qkv"].dtype == jnp.int8
    if quantized:  # --precision int8: same dequant contract as attention()
        from aaclip_tpu.ops.quant import qdot

        v = qdot(x, p["w_qkv"][:, 2 * D:], p["w_qkv_s"][2 * D:])
    else:
        w_v = p["w_qkv"][:, 2 * D:]
        v = jnp.dot(xc, w_v.astype(cd), preferred_element_type=jnp.float32,
                    precision=policy.precision)
    v = v + p["b_qkv"][2 * D:].astype(jnp.float32)
    v = v.reshape(B, L, num_heads, hd)
    scores = jnp.einsum(
        "alhd,blhd->lhab", v.astype(cd), v.astype(cd),
        preferred_element_type=jnp.float32, precision=policy.precision,
    ) * scale
    if valid is not None:
        # padded final batch: the reference runs the SMALLER unpadded batch,
        # i.e. its cross-batch softmax sees only the real samples — mask the
        # pad rows out of the key axis so valid samples' features match the
        # reference's tail-batch semantics (pad queries produce garbage and
        # are excluded from the loss by the same validity mask)
        scores = jnp.where(valid.astype(bool)[None, None, None, :],
                           scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "lhab,blhd->alhd", probs.astype(cd), v.astype(cd),
        preferred_element_type=jnp.float32, precision=policy.precision,
    ).reshape(B, L, D)
    if quantized:
        out = qdot(out, p["w_out"], p["w_out_s"])
    else:
        out = jnp.dot(out.astype(cd), p["w_out"].astype(cd),
                      preferred_element_type=jnp.float32,
                      precision=policy.precision)
    out = out + p["b_out"].astype(jnp.float32)
    return out.astype(x.dtype)


def mlp(x: jax.Array, p: dict, act, policy: DtypePolicy = DtypePolicy()) -> jax.Array:
    from jax.ad_checkpoint import checkpoint_name

    def sub(wk):
        d = {"w": p[wk], "b": p["b" + wk[1:]]}
        if wk + "_s" in p:
            d["w_s"] = p[wk + "_s"]
        return d

    h = linear(x, sub("w_fc"), policy)
    h = checkpoint_name(h, "mlp_fc")  # pre-activation (act recompute is cheap)
    h = act(h)
    return linear(h, sub("w_proj"), policy).astype(x.dtype)


def residual_block(
    x: jax.Array,
    p: dict,
    num_heads: int,
    *,
    mask: Optional[jax.Array] = None,
    vv: bool = False,
    act=gelu,
    policy: DtypePolicy = DtypePolicy(),
    attn_fn=None,
    vv_attn_fn=None,
    block_fn=None,
    vv_block_fn=None,
) -> jax.Array:
    """Pre-LN residual attention block (reference model/transformer.py:239-258).

    ``attn_fn`` / ``vv_attn_fn`` optionally override the standard / V-V
    attention implementation (e.g. the Pallas kernel); each receives
    ``(x_normed, params)`` and must return the projected attention output.
    ``block_fn`` / ``vv_block_fn`` override the ENTIRE block (the fused
    Pallas path, ops/fused_block.make_block_fn): they receive the raw
    residual stream + params and return the block output.
    """
    from jax.ad_checkpoint import checkpoint_name

    whole = vv_block_fn if vv else block_fn
    if whole is not None:
        if mask is not None:
            raise ValueError(
                "block_fn overrides do not support attention masks (the "
                "fused kernels are unmasked); use attn_fn or the default "
                "path for masked towers")
        return whole(x, p)
    h = layer_norm(x, p["ln_1"])
    override = vv_attn_fn if vv else attn_fn
    if override is not None:
        if mask is not None:
            # same guard the block_fn branch has: every attn_fn override
            # in this repo (Pallas, TP) is unmasked, and silently dropping
            # the mask would compute unmasked attention with no error
            raise ValueError("attn_fn overrides are unmasked; use the "
                             "default attention path for masked towers")
        a = override(h, p["attn"])
    else:
        a = attention(h, p["attn"], num_heads, mask=mask, vv=vv, policy=policy)
    # names are inert without a checkpoint policy; the selective-remat mode
    # (vit.run_block_range remat="selective") saves these tensors so the
    # backward skips re-running the attention kernel and the MLP up-matmul
    a = checkpoint_name(a, "attn_out")
    x = x + a
    x = x + mlp(layer_norm(x, p["ln_2"]), p["mlp"], act, policy)
    return x


def norm_matched_blend(x: jax.Array, adapted: jax.Array, weight: float) -> jax.Array:
    """Rescale the adapter output to the residual stream's per-token norm,
    then convex-blend (reference model/adapter.py:93-99, :130-136).

    ``a_norm`` is clamped away from exact zero: an all-zero adapter output
    (e.g. a pipeline bubble tick, or a pathological input) would otherwise
    NaN the whole stream via 0 * inf — the same guard
    parallel/pipeline.py's block body uses, so both paths stay
    bit-identical in the edge too.  Real inputs never produce norms below
    1e-12, so the clamp is numerics-neutral."""
    x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    a_norm = jnp.maximum(
        jnp.linalg.norm(adapted, axis=-1, keepdims=True), 1e-12)
    matched = adapted * (x_norm / a_norm)
    if isinstance(weight, jax.Array):
        # traced per-layer weight (parallel/pipeline.py): cast the
        # coefficients to the stream dtype BEFORE blending so the bf16
        # path arithmetic matches the python-float path above (a traced
        # f32 weight would otherwise promote the whole blend to f32 and
        # round once at the end — one-ulp-per-block divergence)
        one_minus = (1.0 - weight).astype(x.dtype)
        return weight.astype(x.dtype) * matched + one_minus * x
    return weight * matched + (1.0 - weight) * x


def simple_adapter(x: jax.Array, p: dict, policy: DtypePolicy = DtypePolicy()) -> jax.Array:
    """Bias-free Linear + LeakyReLU (reference model/adapter_modules.py:6-13)."""
    return leaky_relu(linear(x, p, policy)).astype(x.dtype)


def simple_proj(
    x: jax.Array, p: dict, relu: bool, policy: DtypePolicy = DtypePolicy()
) -> jax.Array:
    """Bias-free Linear, optionally followed by LeakyReLU (reference
    model/adapter_modules.py:16-26)."""
    y = linear(x, p, policy)
    if relu:
        y = leaky_relu(y)
    return y.astype(x.dtype)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return x / n


def causal_mask(length: int) -> jax.Array:
    """Additive causal mask: 0 on/below the diagonal, -inf above
    (reference model/transformer.py:629-635)."""
    neg = jnp.full((length, length), -jnp.inf, dtype=jnp.float32)
    return jnp.triu(neg, k=1)


def surgery_vv_start(layers: int, surgery_until_layer: int) -> int:
    """First V-V block index: the surgery tower replaces the LAST
    ``surgery_until_layer - 1`` blocks with V-V attention (reference
    model/clip.py surgery construction); clamped at 0 when the flag
    exceeds the tower depth.  The ONE definition shared by
    vit.surgery_patch_features and train/steps.stage1_features_fn — their
    stage-1 features must stay identical."""
    return max(0, layers - (surgery_until_layer - 1))


def make_batch_vv_attn_fn(num_heads: int, policy: DtypePolicy, valid=None):
    """attn_fn closure for the reference-exact batch-coupled V-V form
    (attention_vv_batch) — shared by both stage-1 entry points.

    ``valid`` ([B] 0/1, optional) masks pad rows out of the cross-batch
    softmax so a padded final batch reproduces the reference's smaller
    unpadded tail batch for every real sample."""
    return lambda h, p: attention_vv_batch(h, p, num_heads, policy=policy,
                                           valid=valid)

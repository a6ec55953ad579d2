"""Vision transformer tower (ViT-L/14) as pure functions.

Covers the three forward variants the reference uses:

* ``encode_image`` — frozen CLIP forward returning the projected CLS token
  plus full token tensors tapped at the requested depths (reference
  model/transformer.py:490-551, model/model.py:185-188).
* the same forward with ``vv_start`` set — the CLIP-Surgery model where the
  last blocks use V-V attention in the residual stream (DAPM_replace,
  model/transformer.py:407-425: with DPAM_layer=20 blocks 5..23 of 24 are
  replaced).
* ``adapted_forward`` — the AdaptedCLIP image path with norm-matched adapter
  blends after blocks 0..image_adapt_until-1, per-level seg projections and
  the pooled detection token (reference model/adapter.py:67-112).

TPU-first structure: block parameters are STACKED along a leading layer
axis and executed with ``lax.scan`` over homogeneous layer segments
(segment boundaries at adapter range end, tap depths, and the V-V start),
so the compiled graph stays ~segment-count sized instead of 24 unrolled
layers — an order of magnitude faster XLA compiles with identical math.
The patchify convolution is a reshape + one big MXU matmul.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from aaclip_tpu.core.config import CLIPConfig, DtypePolicy
from aaclip_tpu.models import layers as L


def slice_blocks(stacked: dict, start: int, stop: int) -> dict:
    """Layer-range slice of a stacked block pytree."""
    return jax.tree.map(lambda a: a[start:stop], stacked)


def run_block_range(x: jax.Array, stacked: dict, num_heads: int, *,
                    mask: Optional[jax.Array] = None, vv: bool = False,
                    adapters: Optional[dict] = None,
                    adapt_weight: float = 0.1,
                    act=L.gelu, policy: DtypePolicy = DtypePolicy(),
                    attn_fn=None, vv_attn_fn=None,
                    block_fn=None, vv_block_fn=None,
                    remat: bool | str = False,
                    resid_fn=None) -> jax.Array:
    """lax.scan over a homogeneous run of residual blocks; optionally each
    block is followed by a norm-matched adapter blend (stacked adapter
    weights zipped into the scan).

    ``resid_fn`` (optional) is applied to the residual stream after every
    block (inside the remat boundary) — used by sequence parallelism to
    pin the carry to a sequence-sharded layout
    (parallel/tensor.make_sp_constraint).

    ``remat=True`` wraps each block in jax.checkpoint — REQUIRED for
    training at real sizes: without it the backward pass stores every
    layer's [B, H, S, S] attention probabilities (tens of GB at ViT-L
    1370-token shapes), blowing HBM.  Rematerialization trades ~33% extra
    forward FLOPs for O(residual-stream) memory.

    ``remat="selective"`` additionally SAVES the named per-block tensors
    (attn_out, attn_qkv, mlp_fc — see layers.residual_block) so the
    backward recomputes only LayerNorms/activations/residual adds, not the
    attention kernel or the matmul outputs.  ~4.4 GB extra HBM at the
    stage-2 production shape (batch 8); requires the Pallas custom-VJP
    attention (the XLA attention backward would still materialize
    [B, H, S, S] probabilities).
    """
    n = jax.tree.leaves(stacked)[0].shape[0]
    if n == 0:
        return x

    def block(h, blk):
        h = L.residual_block(h, blk, num_heads, mask=mask, vv=vv, act=act,
                             policy=policy, attn_fn=attn_fn,
                             vv_attn_fn=vv_attn_fn, block_fn=block_fn,
                             vv_block_fn=vv_block_fn)
        if resid_fn is not None:
            h = resid_fn(h)
        return h

    def block_adapted(h, blk_and_ad):
        blk, ad = blk_and_ad
        h = block(h, blk)
        a = L.simple_adapter(h, ad, policy)
        return L.norm_matched_blend(h, a, adapt_weight)

    fn = block if adapters is None else block_adapted
    if remat == "selective":
        fn = jax.checkpoint(fn, policy=jax.checkpoint_policies.
                            save_only_these_names("attn_out", "attn_qkv",
                                                  "mlp_fc"))
    elif remat:
        fn = jax.checkpoint(fn)
    xs = stacked if adapters is None else (stacked, adapters)

    if n == 1:
        return fn(x, jax.tree.map(lambda a: a[0], xs))

    def body(h, per_layer):
        return fn(h, per_layer), None

    x, _ = jax.lax.scan(body, x, xs)
    return x


def _segments(boundaries: Sequence[int]) -> List[Tuple[int, int]]:
    bs = sorted(set(boundaries))
    return [(bs[i], bs[i + 1]) for i in range(len(bs) - 1) if bs[i + 1] > bs[i]]


def patchify(x: jax.Array, conv_w: jax.Array, patch: int,
             policy: DtypePolicy = DtypePolicy()) -> jax.Array:
    """[B, 3, H, W] -> [B, (H/p)*(W/p), width] via an MXU matmul.

    ``conv_w`` is the flattened patch-embedding kernel
    [3*patch*patch, width] with (c, ky, kx) input ordering.
    """
    from aaclip_tpu.ops.preprocess import extract_patches

    x = extract_patches(x, patch)
    cd = policy.compute_dtype
    return jnp.dot(x.astype(cd), conv_w.astype(cd),
                   preferred_element_type=jnp.float32,
                   precision=policy.precision)


def embed(params: dict, cfg: CLIPConfig, images: jax.Array,
          policy: DtypePolicy = DtypePolicy(),
          patch_embed_fn=None) -> jax.Array:
    """Patchify, prepend CLS, add positional embeddings, ln_pre.

    ``patch_embed_fn`` optionally replaces the patchify matmul (e.g. the
    fused uint8-normalization embed, ops/preprocess.py).  The residual
    stream is carried in the policy's compute dtype: on the bf16 fast path
    this halves every LayerNorm/residual/activation memory pass (statistics
    still run fp32 inside layer_norm)."""
    v = cfg.vision
    if patch_embed_fn is not None:
        x = patch_embed_fn(images)
    else:
        x = patchify(images, params["conv1"]["w"], v.patch_size, policy)
    x = x.astype(policy.compute_dtype)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype)[None, None, :],
        (x.shape[0], 1, v.width),
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(x.dtype)[None]
    return L.layer_norm(x, params["ln_pre"])


def _trunk_with_taps(params: dict, cfg: CLIPConfig, images: jax.Array,
                     out_layers: Sequence[int], *,
                     vv_start: Optional[int],
                     adapters: Optional[dict], adapt_weight: float,
                     act, policy: DtypePolicy, attn_fn,
                     vv_attn_fn=None, block_fn=None, vv_block_fn=None,
                     remat: bool | str = False,
                     patch_embed_fn=None,
                     prefix_attn_fn=None,
                     resid_fn=None) -> Tuple[jax.Array, List[jax.Array]]:
    """Shared segmented trunk; returns (final x, taps at out_layers).

    ``policy.bf16_until`` stages the first K blocks at single-pass bf16
    matmuls (residual stream stays in the policy's fp32 compute dtype —
    block outputs are cast back to ``x.dtype``; LayerNorm statistics are
    always fp32).  ``prefix_attn_fn`` is the attention override for those
    staged blocks (built against ``policy.prefix_policy()``); without it
    the staged segments use XLA attention at bf16.  V-V segments are never
    staged down (the 3-pass kernel is used as given — more precise, so no
    correctness concern; in practice staging is an inference-path feature
    and the V-V tower belongs to stage-1 training).
    """
    if act is None:
        act = L.config_act(cfg, policy)
    v = cfg.vision
    n_adapt = 0
    if adapters is not None:
        n_adapt = jax.tree.leaves(adapters)[0].shape[0]
    if n_adapt > v.layers:
        # the segment loop below would silently apply only the first
        # v.layers adapters and train the rest as dead weight
        raise ValueError(
            f"{n_adapt} adapters exceed the {v.layers}-layer tower; set "
            f"image_adapt_until to match the model config")
    bad = [l for l in out_layers if not 0 < l <= v.layers]
    if bad:
        raise ValueError(
            f"tap depths {bad} out of range for a {v.layers}-layer tower; "
            f"set levels/adapt flags to match the model config")
    stage_k = 0
    if policy.bf16_until and jnp.dtype(policy.compute_dtype).itemsize >= 4:
        stage_k = min(policy.bf16_until, v.layers)
    prefix_pol = policy.prefix_policy() if stage_k else policy
    # mixed-prefix int8 (policy.int8_until): the caller ships a SECOND
    # stacked tree "blocks_q" holding the quantized leaves of blocks
    # [0, q_k) — stacked scan leaves must be dtype-homogeneous, so a
    # segment boundary (not a mixed stack) is the only layout that works;
    # attention/mlp dispatch on the sliced leaves' dtype as usual.  The
    # float tree then holds ONLY the suffix [q_k, layers) (keeping the
    # quantized blocks' float copies alive would waste ~q_k/layers of the
    # trunk's HBM on unreachable leaves), so float slices index with a
    # -q_k offset.
    q_k = 0
    if "blocks_q" in params:
        q_k = jax.tree.leaves(params["blocks_q"])[0].shape[0]
        n_float = jax.tree.leaves(params["blocks"])[0].shape[0]
        if n_float != v.layers - q_k:
            raise ValueError(
                f"mixed-prefix trunk: the float block stack must hold "
                f"exactly the suffix [{q_k}, {v.layers}) "
                f"({v.layers - q_k} layers), got {n_float}")
    bounds = [0, v.layers, n_adapt, stage_k, q_k] + [l for l in out_layers]
    if vv_start is not None:
        bounds.append(vv_start)
    x = embed(params, cfg, images, policy, patch_embed_fn=patch_embed_fn)
    taps = {}
    for start, stop in _segments([b for b in bounds if 0 <= b <= v.layers]):
        if q_k and stop <= q_k:
            seg = slice_blocks(params["blocks_q"], start, stop)
        else:
            seg = slice_blocks(params["blocks"], start - q_k, stop - q_k)
        seg_adapters = None
        if adapters is not None and stop <= n_adapt:
            seg_adapters = slice_blocks(adapters, start, stop)
        vv = vv_start is not None and start >= vv_start
        staged = stop <= stage_k and not vv
        x = run_block_range(x, seg, v.heads, vv=vv, adapters=seg_adapters,
                            adapt_weight=adapt_weight, act=act,
                            policy=prefix_pol if staged else policy,
                            attn_fn=prefix_attn_fn if staged else attn_fn,
                            vv_attn_fn=vv_attn_fn,
                            block_fn=block_fn, vv_block_fn=vv_block_fn,
                            remat=remat, resid_fn=resid_fn)
        if stop in out_layers:
            taps[stop] = x
    return x, [taps[l] for l in out_layers]


def encode_image(
    params: dict,
    cfg: CLIPConfig,
    images: jax.Array,
    out_layers: Sequence[int] = (),
    *,
    vv_start: Optional[int] = None,
    policy: DtypePolicy = DtypePolicy(),
    act=None,
    attn_fn=None,
    vv_attn_fn=None,
    block_fn=None,
    vv_block_fn=None,
    prefix_attn_fn=None,
) -> Tuple[jax.Array, List[jax.Array]]:
    """Frozen CLIP image forward.

    Returns ``(pooled, tokens)`` where ``pooled`` is the projected CLS
    embedding [B, embed_dim] and ``tokens`` holds the full residual-stream
    tensors [B, 1+num_patches, width] after each 1-indexed layer in
    ``out_layers``.  ``vv_start`` switches blocks with index >= vv_start
    (0-indexed) to V-V attention.
    """
    x, taps = _trunk_with_taps(params, cfg, images, out_layers,
                               vv_start=vv_start, adapters=None,
                               adapt_weight=0.0, act=act, policy=policy,
                               attn_fn=attn_fn, vv_attn_fn=vv_attn_fn,
                               block_fn=block_fn, vv_block_fn=vv_block_fn,
                               prefix_attn_fn=prefix_attn_fn)
    pooled = L.layer_norm(x[:, 0, :], params["ln_post"])
    cd = policy.compute_dtype
    pooled = jnp.dot(pooled.astype(cd), params["proj"].astype(cd),
                     preferred_element_type=jnp.float32,
                     precision=policy.precision).astype(x.dtype)
    return pooled, taps


def surgery_patch_features(
    params: dict,
    cfg: CLIPConfig,
    images: jax.Array,
    out_layers: Sequence[int],
    surgery_until_layer: int = 20,
    *,
    policy: DtypePolicy = DtypePolicy(),
    act=None,
    attn_fn=None,
    vv_attn_fn=None,
    block_fn=None,
    vv_block_fn=None,
    vv_mode: str = "batch",
) -> List[jax.Array]:
    """Stage-1 feature extraction from the surgery model: tapped patch tokens
    (CLS dropped) -> ln_post -> @proj (reference train.py:75-81).

    ``surgery_until_layer`` matches the --surgery_until_layer flag: the last
    (surgery_until_layer - 1) blocks use V-V attention.

    ``vv_mode="batch"`` (default) is reference-exact: the surgery blocks
    attend across the batch at each position (the reference's layout quirk,
    layers.attention_vv_batch / docs/PARITY.md).  ``vv_mode="spatial"`` is
    the arguably-intended per-sample spatial V-V attention (may use the
    packed Pallas kernel via ``vv_attn_fn``).
    """
    # staging (bf16_until) is an inference-path feature: stage-1 surgery
    # features are training supervision, so every entry point — this one
    # (the AdaptedCLIP.surgery_features facade) and train/steps.py's
    # stage1_features_fn — must produce identical unstaged numerics for a
    # given precision name
    policy = policy.unstaged()
    if vv_mode == "batch":
        vv_attn_fn = L.make_batch_vv_attn_fn(cfg.vision.heads, policy)
        vv_block_fn = None
    elif vv_mode != "spatial":
        raise ValueError(f"vv_mode must be 'batch' or 'spatial', got {vv_mode!r}")
    vv_start = L.surgery_vv_start(cfg.vision.layers, surgery_until_layer)
    _, taps = encode_image(
        params, cfg, images, out_layers, vv_start=vv_start, policy=policy,
        act=act, attn_fn=attn_fn, vv_attn_fn=vv_attn_fn,
        block_fn=block_fn, vv_block_fn=vv_block_fn,
    )
    cd = policy.compute_dtype
    feats = []
    for t in taps:
        t = L.layer_norm(t[:, 1:, :], params["ln_post"])
        t = jnp.dot(t.astype(cd), params["proj"].astype(cd),
                    preferred_element_type=jnp.float32,
                    precision=policy.precision)
        feats.append(t)
    return feats


def adapted_forward(
    params: dict,
    image_adapter: dict,
    cfg: CLIPConfig,
    images: jax.Array,
    *,
    image_adapt_weight: float = 0.1,
    levels: Sequence[int] = (6, 12, 18, 24),
    proj_relu: bool = False,
    policy: DtypePolicy = DtypePolicy(),
    act=None,
    attn_fn=None,
    block_fn=None,
    remat: bool | str = False,
    patch_embed_fn=None,
    prefix_attn_fn=None,
    resid_fn=None,
) -> Tuple[List[jax.Array], jax.Array]:
    """AdaptedCLIP image forward (reference model/adapter.py:67-112).

    Returns ``(seg_tokens, det_token)``: a list of L2-normalized per-level
    patch embeddings [B, num_patches, embed_dim] and the pooled detection
    embedding [B, embed_dim].
    """
    _, taps = _trunk_with_taps(
        params, cfg, images, levels, vv_start=None,
        adapters=image_adapter["layer_adapters"],
        adapt_weight=image_adapt_weight, act=act, policy=policy,
        attn_fn=attn_fn, block_fn=block_fn, remat=remat,
        patch_embed_fn=patch_embed_fn, prefix_attn_fn=prefix_attn_fn,
        resid_fn=resid_fn,
    )
    taps = [t[:, 1:, :] for t in taps]  # drop CLS
    tokens = [L.layer_norm(t, params["ln_post"]) for t in taps]

    def proj_norm(t, p):
        # bf16 matmul, but L2-normalize on the fp32 accumulator output so
        # the unit vectors feeding the 100x similarity scores stay precise
        y = L.linear(t, p, policy)
        if proj_relu:
            y = L.leaky_relu(y)
        return L.l2_normalize(y)

    seg_tokens = [proj_norm(t, image_adapter["seg_proj"][i])
                  for i, t in enumerate(tokens)]
    det = proj_norm(tokens[-1], image_adapter["det_proj"]).mean(axis=1)
    return seg_tokens, det

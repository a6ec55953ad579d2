"""Jitted training steps for the two stages.

Stage 1 (reference train.py:38-114): the *text* adapters train against a
pixel segmentation loss computed from frozen CLIP-Surgery patch features.
The reference's per-level loop overwrites ``loss`` each iteration
(train.py:87-96), so only the LAST tapped level (layer 24) contributes to
the gradient — this implementation computes exactly that level and adds the
orthogonality term once, matching the reference's effective loss.

Stage 2 (reference train.py:117-174): text anchors are frozen; the image
adapters train with CE on the detection token plus the seg loss summed over
all four levels.

TPU-first shifts: each step is ONE jitted function (anchor encode -> tower
forward -> fused similarity/losses -> grads -> optax update); anchors for
all dataset classes are encoded in a single batched text forward and
gathered per-sample by class index (same gradients as the reference's
per-unique-class loop).  Batches carry a validity mask so padded final
batches reproduce exact-batch loss semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp
import optax

from aaclip_tpu.core.config import AdapterConfig, CLIPConfig, DtypePolicy
from aaclip_tpu.models import layers as Lyr
from aaclip_tpu.models.text_model import adapted_encode_text
from aaclip_tpu.models.vit import adapted_forward
from aaclip_tpu.ops import losses as LL
from aaclip_tpu.ops.similarity import level_scores, train_similarity_logit
from aaclip_tpu.text.anchors import reduce_to_anchors


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def init_state(params: dict, tx: optax.GradientTransformation) -> TrainState:
    # copy: the jitted steps donate the state's buffers, which must not
    # alias the caller's (possibly reused) initial parameters
    params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# Stage 1


def stage1_features_fn(clip_params: dict, cfg: CLIPConfig, *,
                       surgery_until_layer: int = 20,
                       policy: DtypePolicy = DtypePolicy(),
                       attn_fn=None, vv_attn_fn=None,
                       vv_mode: str = "batch",
                       chunk: int | None = None,
                       mesh=None, sequence_parallel: bool = False):
    """Returns a jitted fn images -> grad-free stage-1 supervision features:
    last-level surgery patch embedding, L2-normalized, plus the frozen
    model's normalized CLS token (reference train.py:74-85).

    The reference runs two complete ViT forwards per batch (a surgery copy
    and the frozen original, train.py:75-76).  Surgery only rewires blocks
    ``vv_start..layers-1`` (DAPM_replace, model/transformer.py:407-425), so
    the two towers are IDENTICAL through block vv_start-1: this computes
    that prefix once and branches into the V-V tail (patch features) and
    the standard tail (CLS token) — bitwise-equal results with vv_start/
    (2*layers) of the block work removed (~10% for the default
    DPAM_layer=20 on a 24-layer tower).

    Being gradient-free, this path may use the (non-differentiable) Pallas
    attention kernels for both the standard and V-V variants.

    ``vv_mode="batch"`` (default) reproduces the reference's V-V layout
    quirk exactly: the surgery blocks attend across the BATCH at each
    position, so supervision features depend on batch composition (reference
    model/transformer.py:125-152 treats the seq-first LND stream as
    batch-first; docs/PARITY.md "V-V attention layout quirk").
    ``vv_mode="spatial"`` selects per-sample spatial V-V attention (the
    intended CLIP-Surgery semantics; batch-composition independent, and the
    packed Pallas V-V kernel applies via ``vv_attn_fn``).

    ``chunk=N`` (spatial mode only) extracts features N images at a time
    and concatenates — EXACT in spatial mode (features are per-sample), a
    semantics change in batch mode (features are batch-coupled), so batch
    mode rejects it.  This is the stage-1 large-batch lever: the text
    tower's forward+backward per step is batch-size independent (all
    C*S prompts every step), so bigger image batches amortize it — but
    whole-batch feature extraction thrashes HBM past batch 32; chunked
    extraction keeps peak memory at the chunk size (measured numbers in
    docs/PERFORMANCE.md "Stage-1").

    ``mesh``: a 2-D ``('data','model')`` mesh Megatron-shards the frozen
    trunk over the model axis (same layout as make_stage2_step); the TP
    closures replace any given ``attn_fn``/``vv_attn_fn`` (Pallas kernels
    are single-shard programs).  ``sequence_parallel=True`` (TP mesh only)
    additionally shards the residual stream's sequence axis
    (Megatron-SP).  Both V-V modes stay exact: head-sharding never splits
    a softmax reduction, and the batch-coupled form's cross-batch mixing
    is a GSPMD all-gather over the data axis.
    """
    from aaclip_tpu.models.vit import embed, run_block_range, slice_blocks
    from aaclip_tpu.parallel.tensor import is_tp_mesh

    # training keeps the policy's uniform matmul precision: the staged
    # bf16-prefix trunk (bf16_until) is an inference-path feature; honoring
    # it here would silently change training numerics across resumes
    policy = policy.unstaged()
    act = Lyr.config_act(cfg, policy)
    layers = cfg.vision.layers
    heads = cfg.vision.heads
    if chunk is not None and chunk < 1:
        raise ValueError(f"feature chunk must be >= 1, got {chunk}")
    if vv_mode not in ("batch", "spatial"):
        raise ValueError(f"vv_mode must be 'batch' or 'spatial', got {vv_mode!r}")
    if sequence_parallel and not is_tp_mesh(mesh):
        raise ValueError("sequence_parallel requires a 2-D mesh with "
                         "model-parallel size > 1 (make_mesh_2d)")
    resid_fn = None
    if is_tp_mesh(mesh):
        from aaclip_tpu.parallel import tensor as tpar

        visual, _ = tpar.shard_visual(clip_params["visual"], cfg, mesh)
        attn_fn = tpar.make_tp_attn_fn(heads, mesh, policy,
                                       sequence_parallel=sequence_parallel)
        vv_attn_fn = tpar.make_tp_vv_attn_fn(
            heads, mesh, policy, batch_mode=(vv_mode == "batch"),
            sequence_parallel=sequence_parallel)
        if sequence_parallel:
            resid_fn = tpar.make_sp_constraint(mesh)

        def make_masked_vv(valid):
            return tpar.make_tp_vv_attn_fn(
                heads, mesh, policy, batch_mode=True, valid=valid,
                sequence_parallel=sequence_parallel)
    else:
        visual = clip_params["visual"]
        if vv_mode == "batch":
            if vv_attn_fn is not None:
                raise ValueError(
                    "a custom vv_attn_fn requires vv_mode='spatial': the "
                    "default batch mode installs the reference-exact "
                    "batch-coupled kernel and would silently replace yours")
            vv_attn_fn = Lyr.make_batch_vv_attn_fn(heads, policy)

        def make_masked_vv(valid):
            return Lyr.make_batch_vv_attn_fn(heads, policy, valid)
    vv_start = Lyr.surgery_vv_start(layers, surgery_until_layer)
    cd_prec = dict(preferred_element_type=jnp.float32,
                   precision=policy.precision)

    def _features_impl(visual, images: jax.Array, vv_fn) -> jax.Array:
        cd = policy.compute_dtype
        x = embed(visual, cfg, images, policy)
        # shared prefix: blocks [0, vv_start) are the same in both towers
        x = run_block_range(
            x, slice_blocks(visual["blocks"], 0, vv_start), heads,
            act=act, policy=policy, attn_fn=attn_fn, resid_fn=resid_fn)
        # V-V surgery tail -> last-level patch features
        xs = run_block_range(
            x, slice_blocks(visual["blocks"], vv_start, layers), heads,
            vv=True, act=act, policy=policy, attn_fn=attn_fn,
            vv_attn_fn=vv_fn, resid_fn=resid_fn)
        feats = Lyr.layer_norm(xs[:, 1:, :], visual["ln_post"])
        feats = jnp.dot(feats.astype(cd), visual["proj"].astype(cd), **cd_prec)
        # standard tail -> frozen CLS embedding
        xc = run_block_range(
            x, slice_blocks(visual["blocks"], vv_start, layers), heads,
            act=act, policy=policy, attn_fn=attn_fn, resid_fn=resid_fn)
        cls = Lyr.layer_norm(xc[:, 0, :], visual["ln_post"])
        cls = jnp.dot(cls.astype(cd), visual["proj"].astype(cd), **cd_prec)
        cls = Lyr.l2_normalize(cls)
        return Lyr.l2_normalize(feats) + cls[:, None, :]

    _features = jax.jit(
        lambda visual, images: _features_impl(visual, images, vv_attn_fn))
    # batch mode only: the cross-batch softmax must see the reference's
    # SMALLER unpadded tail batch, so a padded final batch masks the pad
    # rows out of the key axis (valid samples' features then match the
    # reference's ragged-batch run; spatial features are per-sample and
    # never need this)
    _features_masked = jax.jit(
        lambda visual, images, valid: _features_impl(
            visual, images, make_masked_vv(valid)))

    if not chunk:
        def features(images, valid=None):
            if valid is None or vv_mode != "batch":
                return _features(visual, images)
            return _features_masked(visual, images,
                                    jnp.asarray(valid, jnp.float32))
        return features
    if vv_mode != "spatial":
        raise ValueError(
            "feature chunking requires vv_mode='spatial': batch-mode "
            "surgery features are batch-coupled (the reference's V-V "
            "layout quirk), so chunked extraction would change them")

    def chunked(images, valid=None):
        # spatial mode: features are per-sample, valid is irrelevant
        B = images.shape[0]
        if B <= chunk:
            return _features(visual, images)
        pieces = [_features(visual, images[i:i + chunk])
                  for i in range(0, B - B % chunk, chunk)]
        if B % chunk:
            pieces.append(_features(visual, images[B - B % chunk:]))
        return jnp.concatenate(pieces)

    return chunked


def make_stage1_step(clip_params: dict, cfg: CLIPConfig, acfg: AdapterConfig,
                     tx: optax.GradientTransformation, prompt_tokens,
                     *, text_norm_weight: float = 0.1,
                     img_size: int | None = None,
                     policy: DtypePolicy = DtypePolicy(),
                     remat: bool | str = True, mesh=None,
                     sequence_parallel: bool = False):
    """Build the jitted stage-1 update.

    ``prompt_tokens``: [n_classes, 16, 77] int32 (all classes of the
    training dataset).  The step takes (state, surgery_feats [B, L, D],
    mask [B, H, W], class_idx [B], valid [B]).

    ``mesh``: a 2-D ``('data','model')`` mesh Megatron-shards the frozen
    TEXT tower (the stage-1 gradient path, reference train.py:38-114) over
    the model axis — forward AND backward — with a causal TP attention
    closure; the prompt batch (C*S sentences, per-step constant work) is
    additionally pinned over the data axis so the text tower's FLOPs split
    across the whole mesh instead of replicating.  Adapter grads are
    psummed over both axes by GSPMD.  ``sequence_parallel=True`` (TP mesh
    only) shards the 77-token stream between matmul regions (Megatron-SP;
    same schedule as make_stage2_step's).
    """
    img = img_size or cfg.vision.image_size
    policy = policy.unstaged()  # staging is inference-only (see features_fn)
    tokens = jnp.asarray(prompt_tokens)
    C, S, _ = tokens.shape
    flat_tokens = tokens.reshape(C * S, -1)
    text_params = clip_params["text"]
    attn_fn = None
    resid_fn = None

    from aaclip_tpu.parallel.tensor import is_tp_mesh

    if sequence_parallel and not is_tp_mesh(mesh):
        raise ValueError("sequence_parallel requires a 2-D mesh with "
                         "model-parallel size > 1 (make_mesh_2d)")
    if is_tp_mesh(mesh):
        from aaclip_tpu.parallel import tensor as tpar

        text_params, _ = tpar.shard_text(text_params, cfg, mesh)
        attn_fn = tpar.make_tp_attn_fn(cfg.text.heads, mesh, policy,
                                       causal=True,
                                       sequence_parallel=sequence_parallel)
        resid_fn = (tpar.make_sp_constraint(mesh) if sequence_parallel
                    else tpar.make_batch_dp_constraint(mesh))

    def loss_fn(text_adapter, text_params, feats, mask, class_idx, valid):
        embeds = adapted_encode_text(
            text_params, text_adapter, cfg, flat_tokens,
            text_adapt_weight=acfg.text_adapt_weight, policy=policy,
            remat=remat, attn_fn=attn_fn, resid_fn=resid_fn,
        )
        anchors = reduce_to_anchors(embeds.reshape(C, S, -1))  # [C, D, 2]
        banchors = anchors[class_idx]                          # [B, D, 2]
        # precision pinned like every other 100x anchor-score site
        # (similarity.level_scores, pipeline.py): fp32 feats x fp32 anchors
        # must not run as single-pass bf16 under the fast policy — the
        # amplified logits feed the focal/dice losses directly
        scores = 100.0 * jnp.einsum(
            "bld,bdk->blk", feats, banchors,
            preferred_element_type=jnp.float32, precision="highest")
        d = train_similarity_logit(scores, img)
        seg = LL.seg_loss_from_logit_masked(d, mask, valid)
        orth = LL.orthogonality_loss_masked(banchors, valid)
        return seg + text_norm_weight * orth

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, text_params, feats, mask, class_idx, valid):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, text_params, feats, mask, class_idx, valid)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return lambda state, feats, mask, class_idx, valid: _step(
        state, text_params, feats, mask, class_idx, valid)


# ---------------------------------------------------------------------------
# Stage 2


def make_stage2_step(clip_params: dict, cfg: CLIPConfig, acfg: AdapterConfig,
                     tx: optax.GradientTransformation, anchors_table,
                     *, img_size: int | None = None,
                     policy: DtypePolicy = DtypePolicy(), attn_fn=None,
                     remat: bool | str = True, mesh=None,
                     sequence_parallel: bool = False,
                     grad_accum: int = 1):
    """Build the jitted stage-2 update.

    ``anchors_table``: [n_classes, D, 2] frozen text anchors.  The step takes
    (state, images [B,3,H,W], mask [B,H,W], label [B], class_idx [B],
    valid [B]).

    ``remat`` (default True) wraps each block in jax.checkpoint.  With the
    XLA attention path it is REQUIRED at real sizes (the backward otherwise
    stores [B,H,S,S] probabilities per layer).  With the Pallas custom-VJP
    attention the probabilities never reach HBM, so ``remat=False`` fits
    and skips the recompute (measured numbers in docs/PERFORMANCE.md).

    ``mesh``: a 2-D ``('data','model')`` mesh (parallel/tensor.make_mesh_2d)
    Megatron-shards the frozen trunk over the model axis for the forward
    AND the backward through it (adapter grads are psummed over both axes
    by GSPMD); a 1-D ``('data',)`` mesh or ``None`` keeps the replicated
    path — batches arrive pre-sharded via ``sharding.shard_batch`` either
    way.  The TP closure replaces any given ``attn_fn`` (Pallas kernels
    are single-shard programs).  ``sequence_parallel=True`` (TP mesh only)
    additionally shards the residual stream's sequence axis over the model
    devices between the matmul regions (Megatron-SP) — under remat this
    also shrinks the per-device saved residuals to S/tp tokens.

    ``grad_accum=K`` splits each batch into K microbatches inside the
    jitted step (``lax.scan``): gradients are accumulated across
    microbatches and applied once, so peak activation memory is that of a
    batch/K forward+backward.  The applied gradient is the MEAN of the K
    microbatch gradients (loss reported is the mean loss); because every
    loss term is a per-sample mean over valid samples, this equals the
    single-big-batch gradient exactly whenever the microbatches carry
    equal valid counts — i.e. everywhere except a ragged final batch,
    where it weights each microbatch's valid samples equally instead.
    The batch size must be divisible by K (train.py pads batches to the
    full loader batch size, so this holds for every step).
    """
    img = img_size or cfg.vision.image_size
    policy = policy.unstaged()  # staging is inference-only (see features_fn)
    anchors_table = jnp.asarray(anchors_table)
    visual = clip_params["visual"]
    resid_fn = None

    from aaclip_tpu.parallel.tensor import is_tp_mesh

    if sequence_parallel and not is_tp_mesh(mesh):
        raise ValueError("sequence_parallel requires a 2-D mesh with "
                         "model-parallel size > 1 (make_mesh_2d)")
    if is_tp_mesh(mesh):
        from aaclip_tpu.parallel import tensor as tpar

        visual, _ = tpar.shard_visual(visual, cfg, mesh)
        attn_fn = tpar.make_tp_attn_fn(cfg.vision.heads, mesh, policy,
                                       sequence_parallel=sequence_parallel)
        if sequence_parallel:
            resid_fn = tpar.make_sp_constraint(mesh)

    def loss_fn(image_adapter, visual, images, mask, label, class_idx, valid):
        seg_tokens, det = adapted_forward(
            visual, image_adapter, cfg, images,
            image_adapt_weight=acfg.image_adapt_weight,
            levels=acfg.levels, proj_relu=acfg.proj_relu,
            policy=policy, attn_fn=attn_fn, remat=remat,
            resid_fn=resid_fn,
        )
        banchors = anchors_table[class_idx]  # [B, D, 2]
        logits = jnp.einsum("bd,bdk->bk", det, banchors,
                            preferred_element_type=jnp.float32,
                            precision=policy.precision)
        loss = LL.cross_entropy_logits_masked(logits, label, valid)
        scores = level_scores(jnp.stack(seg_tokens), banchors)  # [n,B,L,2]
        for lvl in range(scores.shape[0]):
            d = train_similarity_logit(scores[lvl], img)
            loss = loss + LL.seg_loss_from_logit_masked(d, mask, valid)
        return loss

    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, visual, images, mask, label, class_idx, valid):
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, visual, images, mask, label, class_idx, valid)
        else:
            B = images.shape[0]
            if B % grad_accum:
                raise ValueError(
                    f"batch size {B} not divisible by grad_accum {grad_accum}")
            micro = jax.tree.map(
                lambda a: a.reshape((grad_accum, B // grad_accum)
                                    + a.shape[1:]),
                (images, mask, label, class_idx, valid))

            def accum(carry, mb):
                loss_sum, grad_sum, n_live = carry
                l, g = jax.value_and_grad(loss_fn)(state.params, visual, *mb)
                # an all-padding microbatch (ragged final batch) has exactly
                # zero gradient, but its dice terms evaluate to a constant
                # 2.0 per level (losses.py seg_loss_from_logit_masked with
                # n_valid clamped to 1) — gate it out and normalize by the
                # LIVE microbatch count so the reported loss keeps the
                # documented per-valid-sample-mean semantics
                live = (jnp.sum(mb[-1]) > 0).astype(jnp.float32)
                return (loss_sum + live * l,
                        jax.tree.map(jnp.add, grad_sum, g),
                        n_live + live), None

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (loss, grads, n_live), _ = jax.lax.scan(
                accum, (jnp.zeros((), jnp.float32), zeros,
                        jnp.zeros((), jnp.float32)), micro)
            n_live = jnp.maximum(n_live, 1.0)
            loss = loss / n_live
            grads = jax.tree.map(lambda g: g / n_live, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    step = lambda state, images, mask, label, class_idx, valid: _step(
        state, visual, images, mask, label, class_idx, valid)
    # all-arguments form for callers that compose this step inside a LARGER
    # jitted program (the fused assemble+step loop, data/device_cache.py):
    # re-tracing the wrapper would close over the 1.7 GB frozen trunk and
    # constant-fold it (CLAUDE.md invariant) — the raw form keeps `visual`
    # an argument.  `_step.__wrapped__` is the unjitted impl (jax.jit
    # exposes it), so outer jits inline it without a nested-donation
    # warning.
    step.raw = _step
    step.visual = visual
    return step

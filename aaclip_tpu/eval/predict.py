"""Batched test-time prediction: one jitted function from images to
(pixel anomaly map, image score).

Reference flow (test.py:53-99): adapted image forward -> 4 seg-token levels
-> per-level similarity map -> blur -> upsample -> sum; image score from
the det token.  Here the post-matmul chain is the fused two-matmul form
(ops/similarity.py) and the whole thing — 24-layer ViT included — is a
single jit, compiled once for all classes (anchors and the domain-dependent
postproc matrix are traced arguments).
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aaclip_tpu.core.config import AdapterConfig, CLIPConfig, DtypePolicy
from aaclip_tpu.models.vit import adapted_forward
from aaclip_tpu.ops.similarity import (apply_postproc_matrix,
                                       collapse_level_scores,
                                       fused_postproc_matrix, image_score,
                                       level_scores)


def make_predict_fn(clip_params: dict, cfg: CLIPConfig, acfg: AdapterConfig,
                    *, img_size: int | None = None,
                    policy: DtypePolicy = DtypePolicy(), attn_fn=None,
                    block_fn=None, uint8_inputs: bool = False,
                    mesh=None, sequence_parallel: bool = False) -> Callable:
    """jitted (image_adapter, images, anchors, M [img, grid]) ->
    (pixel_map [B, img, img], image_score [B]).

    ``anchors`` is [D, 2] (one class for the whole batch — the reference
    eval protocol) or per-sample [B, D, 2] (mixed-class batches, e.g. the
    serving engine batching requests across classes).

    ``uint8_inputs=True`` accepts raw uint8 pixel batches: the CLIP
    normalization is folded into the patch-embedding matmul on device
    (ops/preprocess.py), quartering host->device transfer.

    ``mesh``: a 1-D ``('data',)`` device mesh. Parameters/anchors are
    replicated, the image batch is sharded over the data axis, and jit
    partitions the whole forward — per-sample work is independent, so no
    collectives are needed and per-sample results are identical to the
    single-device path. The reference eval loop (reference test.py:53-99)
    is strictly single-device; this is the TPU-native scale-out of it.

    A 2-D ``('data', 'model')`` mesh (parallel/tensor.make_mesh_2d) adds
    tensor parallelism: frozen trunk weights are sharded Megatron-style
    over the model axis (heads / MLP hidden), the batch over the data axis.
    The attention override is replaced by the TP-aware closure (Pallas
    kernels are single-shard programs; ``block_fn`` overrides are rejected)
    and results stay equal to the single-device path within fp tolerance.

    ``sequence_parallel=True`` (requires a TP mesh) additionally shards
    the residual stream's sequence axis over the model devices between the
    matmul regions (Megatron-SP): the per-block all-reduces become
    reduce-scatter + all-gather pairs and every LayerNorm / residual /
    adapter-blend computes S/tp tokens per device.
    """
    from aaclip_tpu.core.params import cast_matmul_weights
    from aaclip_tpu.models.layers import config_act

    img = img_size or cfg.vision.image_size
    visual = cast_matmul_weights(clip_params["visual"], policy)
    if policy.quant_int8:
        # int8 quantized trunk (ops/quant.py): per-channel int8 weights
        # for QKV/out/MLP; the scale leaves ride the stacked-block pytree
        # through lax.scan slicing like any other per-layer parameter.
        # Composes with data parallelism (replication is generic) but not
        # with the Megatron repack or fused block kernels.
        from aaclip_tpu.ops.quant import quantize_block_weights
        from aaclip_tpu.parallel.tensor import is_tp_mesh as _is_tp

        if _is_tp(mesh) or block_fn is not None:
            raise ValueError("int8 quantized inference does not compose "
                             "with tensor parallelism or block_fn "
                             "overrides")
        visual = dict(visual)
        # quantize from the ORIGINAL leaves: the policy's compute dtype is
        # bf16, so fitting the int8 grid to the cast copies would round
        # twice (bf16's 8-bit mantissa, then int8)
        k = policy.int8_until or 0
        if k < 0 or k > cfg.vision.layers:
            raise ValueError(
                f"int8_until={k} out of range for the "
                f"{cfg.vision.layers}-layer tower")
        if 0 < k < cfg.vision.layers:
            # mixed prefix: quantize blocks [0, k) into a SECOND stacked
            # tree (scan leaves are dtype-homogeneous, so a mixed stack
            # is impossible); _trunk_with_taps routes segments by depth.
            # The late blocks — the det token's tap — stay bf16.  The
            # float stack keeps ONLY the suffix [k, layers): retaining
            # the quantized blocks' float copies would leave ~k/layers
            # of the trunk resident in HBM but unreachable.
            from aaclip_tpu.models.vit import slice_blocks
            visual["blocks_q"] = quantize_block_weights(
                slice_blocks(visual["blocks"], 0, k),
                source=slice_blocks(clip_params["visual"]["blocks"], 0, k))
            visual["blocks"] = slice_blocks(visual["blocks"], k,
                                            cfg.vision.layers)
        else:
            visual["blocks"] = quantize_block_weights(
                visual["blocks"], source=clip_params["visual"]["blocks"])
    _act = config_act(cfg, policy)
    _patch_embed = None
    if uint8_inputs:
        from aaclip_tpu.ops.preprocess import (
            fold_normalization_into_conv1, patchify_uint8)

        w_f, b_f = fold_normalization_into_conv1(
            clip_params["visual"]["conv1"]["w"], cfg.vision.patch_size)
        w_f = w_f.astype(policy.compute_dtype)

        def _patch_embed(images_u8):
            return patchify_uint8(images_u8, w_f, b_f, cfg.vision.patch_size,
                                  compute_dtype=policy.compute_dtype,
                                  precision=policy.precision)

    # the M (blur+upsample) einsums stay exact 6-pass fp32 only on the fp32
    # parity policy; the fast policies use the 3-pass form (~1e-5 rel on the
    # map, ~5% of the e2e step)
    _pp_prec = "highest" if policy.precision == "highest" else "high"

    # staged-precision trunk (policy.bf16_until > 0, e.g. fp32_high): the
    # leading blocks need an attention kernel built against the bf16 prefix
    # policy; later blocks keep the given attn_fn
    prefix_attn_fn = None
    tp_shardings = None
    resid_fn = None
    from aaclip_tpu.parallel.tensor import is_tp_mesh

    if sequence_parallel and not is_tp_mesh(mesh):
        raise ValueError("sequence_parallel requires a 2-D mesh with "
                         "model-parallel size > 1 (make_mesh_2d)")
    if is_tp_mesh(mesh):
        from aaclip_tpu.parallel import tensor as tpar

        if block_fn is not None:
            raise ValueError(
                "tensor parallelism and fused block_fn overrides are "
                "mutually exclusive (Pallas block kernels are single-shard "
                "programs)")
        # the TP closure supersedes any Pallas attn_fn: attention must read
        # the head-major repacked weights and carry the 'model' shardings
        visual, tp_shardings = tpar.shard_visual(visual, cfg, mesh)
        attn_fn = tpar.make_tp_attn_fn(cfg.vision.heads, mesh, policy,
                                       sequence_parallel=sequence_parallel)
        if sequence_parallel:
            resid_fn = tpar.make_sp_constraint(mesh)
        if policy.bf16_until:
            prefix_attn_fn = tpar.make_tp_attn_fn(
                cfg.vision.heads, mesh, policy.prefix_policy(),
                sequence_parallel=sequence_parallel)
    elif policy.bf16_until and attn_fn is not None:
        from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn

        prefix_attn_fn = maybe_make_attn_fn(cfg, policy.prefix_policy())

    def _predict_impl(visual, image_adapter, images, anchors, M):
        seg_tokens, det = adapted_forward(
            visual, image_adapter, cfg, images,
            image_adapt_weight=acfg.image_adapt_weight,
            levels=acfg.levels, proj_relu=acfg.proj_relu,
            policy=policy, act=_act, attn_fn=attn_fn, block_fn=block_fn,
            patch_embed_fn=_patch_embed, prefix_attn_fn=prefix_attn_fn,
            resid_fn=resid_fn,
        )
        stacked = jnp.stack(seg_tokens)                     # [n, B, L, D]
        scores = level_scores(stacked, anchors)             # [n, B, L, 2]
        _, B, L, _ = scores.shape
        grid = int(round(L ** 0.5))
        q = collapse_level_scores(scores).reshape(B, grid, grid)
        pix = apply_postproc_matrix(q, M, precision=_pp_prec)
        return pix, image_score(det, anchors)

    if mesh is None:
        _predict = jax.jit(_predict_impl)

        def predict(image_adapter, images, anchors, M):
            return _predict(visual, image_adapter, images, anchors, M)
    else:
        from aaclip_tpu.parallel import sharding as sh

        repl = sh.replicated(mesh)
        bsh = sh.batch_sharding(mesh)
        vsh = tp_shardings if tp_shardings is not None else repl
        _predict = jax.jit(_predict_impl,
                           in_shardings=(vsh, repl, bsh, repl, repl),
                           out_shardings=(bsh, bsh))
        if tp_shardings is None:
            visual = jax.device_put(visual, repl)
        dp = dict(mesh.shape).get("data", mesh.devices.size)

        def predict(image_adapter, images, anchors, M):
            assert images.shape[0] % dp == 0, (
                f"batch {images.shape[0]} not divisible by data-parallel "
                f"size {dp}")
            return _predict(visual, image_adapter, images, anchors, M)

    # expose the all-arguments form (visual first) for callers that re-jit
    # the function themselves: re-jitting `predict` would bake the captured
    # 1.7GB of frozen weights into the outer graph as constants
    predict.raw = _predict
    predict.visual = visual
    predict.mesh = mesh
    return predict


def run_class_predictions(predict_fn, image_adapter, loader, anchors,
                          domain: str, img_size: int, grid: int,
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, List[str]]:
    """Drive the loader through predict_fn; returns (masks, labels,
    pixel_preds, image_preds, file_names) trimmed to valid samples."""
    M = fused_postproc_matrix(grid, img_size, domain)
    mesh = getattr(predict_fn, "mesh", None)
    if getattr(predict_fn, "host_inputs", False):
        # frozen-artifact path: predict_fn consumes HOST arrays and does
        # its own (per-replica) device placement — staging on device here
        # would add a wasted host->device->host round trip per batch
        M = np.asarray(M)
        anchors = np.asarray(anchors)
        _place = np.asarray
    elif mesh is not None:
        from aaclip_tpu.parallel import sharding as sh

        repl = sh.replicated(mesh)
        bsh = sh.batch_sharding(mesh)
        M, anchors = jax.device_put((M, anchors), repl)
        image_adapter = jax.device_put(
            jax.tree.map(jnp.asarray, image_adapter), repl)
        _place = lambda imgs: jax.device_put(imgs, bsh)
    else:
        # stage the loop invariants on device once (re-uploading M per
        # batch through a slow host link is pure per-forward overhead)
        M = jnp.asarray(M)
        anchors = jnp.asarray(anchors)
        _place = jnp.asarray
    masks, labels, pix_preds, img_preds, files = [], [], [], [], []
    for batch in loader:
        pix, score = predict_fn(image_adapter, _place(batch["image"]),
                                anchors, M)
        n = batch["n_valid"]
        masks.append(batch["mask"][:n])
        labels.append(batch["label"][:n])
        # keep device arrays; async dispatch lets the next batch's forward
        # overlap these transfers, materialized together at the end
        pix_preds.append(pix[:n])
        img_preds.append(score[:n])
        files.extend(batch["file_name"][:n])
    pix_preds = [np.asarray(p) for p in pix_preds]
    img_preds = [np.asarray(s) for s in img_preds]
    return (np.concatenate(masks), np.concatenate(labels),
            np.concatenate(pix_preds), np.concatenate(img_preds), files)


def make_anchor_encoder(clip_params: dict, cfg: CLIPConfig, acfg: AdapterConfig,
                        text_adapter=None, *,
                        policy: DtypePolicy = DtypePolicy()) -> Callable:
    """jitted [N, 77] tokens -> [N, D] embeddings, adapted when a text
    adapter is given (reference test.py:192-200)."""
    from aaclip_tpu.models.text_model import adapted_encode_text, encode_text

    from aaclip_tpu.core.params import cast_matmul_weights

    text_params = cast_matmul_weights(clip_params["text"], policy)
    if text_adapter is None:
        @jax.jit
        def _enc(text_params, tokens):
            return encode_text(text_params, cfg, tokens, policy=policy)

        return lambda tokens: _enc(text_params, tokens)

    @jax.jit
    def _enc_adapted(text_params, text_adapter, tokens):
        return adapted_encode_text(
            text_params, text_adapter, cfg, tokens,
            text_adapt_weight=acfg.text_adapt_weight, policy=policy)

    return lambda tokens: _enc_adapted(text_params, text_adapter, tokens)

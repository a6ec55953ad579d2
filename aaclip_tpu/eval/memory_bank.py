"""Few-shot memory bank: support-feature collection + nearest-neighbor
fusion with the text-anchor prediction.

Reference status: the reference ships ONLY the bank-construction helper
(``get_support_features``, reference test.py:39-50 — run the adapted
model over a support loader, reshape each level's patch tokens to
``[-1, D]``, concatenate over support images) and never calls it; the
scoring side of the paper's few-shot protocol does not exist in its code.
This module reproduces that construction faithfully (`collect_bank`) and
adds the natural nearest-neighbor scoring as a documented extension
(disabled by default; ``test.py --memory_bank`` opts in):

* per-patch bank score = ``100 * (1 - max cosine similarity to the
  bank) / 2`` per level, summed over levels — the same 100x scale and
  level-sum as the text path's collapse (ops/similarity.py:99-108), so
  the two maps fuse on equal footing;
* pixel map: the bank grid goes through the SAME fused blur+upsample
  matrix as the text map, then ``fused = (1-w)*text + w*bank``;
* image score: ``max`` over the bank grid, rescaled to [0, 1] like the
  text det score (reference test.py:83-84), fused with the same weight.

Banks are built from the adapted model of the snapshot under evaluation
(the reference comment: "training for an epoch first, Then use this
updated model for memory bank construction"), so `collect_bank` is
per-snapshot, per-class.

TPU shape: the bank max-similarity is one MXU matmul per level chunked
over the bank axis with ``lax.scan`` carrying a running max — peak memory
is [n, B, L, chunk] instead of [n, B, L, N], so 500+-shot banks fit.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from aaclip_tpu.core.config import AdapterConfig, CLIPConfig, DtypePolicy
from aaclip_tpu.models.vit import adapted_forward
from aaclip_tpu.ops.similarity import (apply_postproc_matrix,
                                       collapse_level_scores, image_score,
                                       level_scores)


def make_patch_features_fn(clip_params: dict, cfg: CLIPConfig,
                           acfg: AdapterConfig, *,
                           img_size: int | None = None,
                           policy: DtypePolicy = DtypePolicy(),
                           attn_fn=None,
                           uint8_inputs: bool = False,
                           mesh=None) -> Callable:
    """jitted ``(image_adapter, images) -> (seg [n, B, L, D], det [B, D])``.

    The same adapted forward the eval path runs (eval/predict.py), exposed
    at the stacked-seg-token level so callers can build banks from the
    exact features the predictor scores with.

    ``mesh`` (a 1-D ``('data',)`` mesh): bank construction runs fully
    REPLICATED — support sets are a handful of images and banks must end
    up replicated for the data-parallel predictor anyway, so replicating
    the (cheap) build is simpler and divisibility-free versus sharding
    it.  The returned bank arrays then carry the replicated sharding the
    dp predict jit expects.
    """
    del img_size  # shapes come from the traced batch
    visual = clip_params["visual"]
    from aaclip_tpu.models.layers import config_act
    _act = config_act(cfg, policy)
    _patch_embed = None
    if uint8_inputs:
        from aaclip_tpu.ops.preprocess import (fold_normalization_into_conv1,
                                               patchify_uint8)
        w_f, b_f = fold_normalization_into_conv1(
            clip_params["visual"]["conv1"]["w"], cfg.vision.patch_size)
        w_f = w_f.astype(policy.compute_dtype)

        def _patch_embed(images_u8):
            return patchify_uint8(images_u8, w_f, b_f, cfg.vision.patch_size,
                                  compute_dtype=policy.compute_dtype,
                                  precision=policy.precision)

    prefix_attn_fn = None
    if policy.bf16_until and attn_fn is not None:
        from aaclip_tpu.ops.flash_attention import maybe_make_attn_fn
        prefix_attn_fn = maybe_make_attn_fn(cfg, policy.prefix_policy())

    def _impl(visual, image_adapter, images):
        seg_tokens, det = adapted_forward(
            visual, image_adapter, cfg, images,
            image_adapt_weight=acfg.image_adapt_weight,
            levels=acfg.levels, proj_relu=acfg.proj_relu,
            policy=policy, act=_act, attn_fn=attn_fn,
            patch_embed_fn=_patch_embed, prefix_attn_fn=prefix_attn_fn)
        return jnp.stack(seg_tokens), det

    if mesh is None:
        _jitted = jax.jit(_impl)
    else:
        from aaclip_tpu.parallel import sharding as sh

        repl = sh.replicated(mesh)
        visual = jax.device_put(visual, repl)
        _jitted = jax.jit(_impl, in_shardings=(repl, repl, repl),
                          out_shardings=(repl, repl))

    def features(image_adapter, images):
        return _jitted(visual, image_adapter, images)

    # UNJITTED impl for callers that compose this forward inside their
    # own sharded jit (make_mb_predict_fn's dp path): calling the jitted
    # `raw` there would nest its replicated in_shardings as constraints
    # and force the whole trunk forward to run REPLICATED (verified by
    # HLO inspection — GSPMD all-gathers the batch)
    features.impl = _impl

    features.raw = _jitted
    features.visual = visual
    return features


def collect_bank(features_fn: Callable, image_adapter, support_images,
                 batch_size: int = 8) -> jax.Array:
    """Support images -> per-level memory bank [n_levels, N, D].

    Reference construction semantics (test.py:39-50): every level's patch
    tokens of every support image, flattened and concatenated — N =
    n_support * L.  Batched here instead of the reference's bs=1 loop
    (identical result: concatenation order is image-major either way).
    """
    support_images = np.asarray(support_images)
    if support_images.ndim != 4:
        raise ValueError(
            f"support_images must be [N, C, H, W], got {support_images.shape}")
    per_level = []
    for i in range(0, support_images.shape[0], batch_size):
        seg, _ = features_fn(image_adapter,
                             jnp.asarray(support_images[i:i + batch_size]))
        per_level.append(seg)  # [n, b, L, D]
    # concat over support images, flatten (image, patch) -> bank axis
    bank = jnp.concatenate(per_level, axis=1)  # [n, N_imgs, L, D]
    n, ni, L, D = bank.shape
    return bank.reshape(n, ni * L, D)


def bank_grid_scores(seg: jax.Array, bank: jax.Array,
                     chunk: int = 1024) -> jax.Array:
    """[n, B, L, D] test features x [n, N, D] bank -> [B, L] grid scores.

    Per level: ``100 * (1 - max_j cos(feat, bank_j)) / 2``; summed over
    levels (the text collapse's scale — see module docstring).  Both sides
    are already L2-normalized (adapted_forward's seg tail), so cosine is a
    plain dot.  Chunked ``lax.scan`` over the bank axis keeps peak memory
    at [n, B, L, chunk]; padding repeats the first bank vector, which can
    never lower a running max.
    """
    n, N, D = bank.shape
    chunk = min(chunk, N)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        bank = jnp.concatenate(
            [bank, jnp.broadcast_to(bank[:, :1, :], (n, pad, D))], axis=1)
    chunks = bank.reshape(n, n_chunks, chunk, D).transpose(1, 0, 2, 3)

    def body(best, ch):  # ch: [n, chunk, D]
        sim = jnp.einsum("nbld,nkd->nblk", seg, ch,
                         preferred_element_type=jnp.float32,
                         precision="highest").max(axis=-1)
        return jnp.maximum(best, sim), None

    init = jnp.full(seg.shape[:-1], -jnp.inf, jnp.float32)
    best, _ = jax.lax.scan(body, init, chunks)
    return (100.0 * (1.0 - best) / 2.0).sum(axis=0)  # [B, L]


def make_mb_predict_fn(clip_params: dict, cfg: CLIPConfig,
                       acfg: AdapterConfig, *,
                       img_size: int | None = None,
                       policy: DtypePolicy = DtypePolicy(), attn_fn=None,
                       uint8_inputs: bool = False,
                       bank_weight: float = 0.5,
                       chunk: int = 1024, mesh=None) -> Callable:
    """Memory-bank-fused predictor.

    Returns ``predict(image_adapter, images, anchors, M, bank) ->
    (pixel_map [B, I, I], image_score [B])`` — the text-anchor prediction
    (identical math to eval/predict.make_predict_fn) fused with the
    nearest-neighbor bank scores at ``bank_weight``.  One forward serves
    both paths.  Binding a per-class bank with ``functools.partial`` gives
    a drop-in ``predict_fn`` for ``run_class_predictions``.

    ``mesh`` (a 1-D ``('data',)`` mesh, round 5): data-parallel eval.
    Both score paths are per-sample separable — the bank max-similarity
    reduces over the (replicated) bank axis per sample — so the batch
    shards over the data axis while params/anchors/bank replicate, the
    same GSPMD shape as eval.predict's dp path.  Bank construction stays
    replicated (see make_patch_features_fn).  Tensor-parallel meshes are
    rejected: the TP attention closure repacks weights head-major, which
    the bank features would then have to share — out of scope for a
    per-class few-shot path.
    """
    from aaclip_tpu.parallel.tensor import is_tp_mesh

    if is_tp_mesh(mesh):
        raise ValueError(
            "make_mb_predict_fn supports a 1-D ('data',) mesh only "
            "(tensor parallelism does not compose with the memory bank)")
    feats_fn = make_patch_features_fn(
        clip_params, cfg, acfg, img_size=img_size, policy=policy,
        attn_fn=attn_fn, uint8_inputs=uint8_inputs, mesh=mesh)
    _pp_prec = "highest" if policy.precision == "highest" else "high"
    w = float(bank_weight)
    if not 0.0 <= w <= 1.0:
        raise ValueError(f"bank_weight must be in [0, 1], got {w}")

    def _impl(visual, image_adapter, images, anchors, M, bank):
        # the UNJITTED features impl: the jitted feats_fn.raw carries
        # replicated in_shardings (for the bank build), which nested
        # inside this batch-sharded jit would constrain the trunk forward
        # to run replicated on every device
        seg, det = feats_fn.impl(visual, image_adapter, images)
        scores = level_scores(seg, anchors)                 # [n, B, L, 2]
        _, B, L, _ = scores.shape
        grid = int(round(L ** 0.5))
        q_text = collapse_level_scores(scores)              # [B, L]
        q_bank = bank_grid_scores(seg, bank, chunk=chunk)   # [B, L]
        q = ((1.0 - w) * q_text + w * q_bank).reshape(B, grid, grid)
        pix = apply_postproc_matrix(q, M, precision=_pp_prec)
        # image level: bank grid max, rescaled to the det score's [0, 1]
        # (its level-sum spans [0, 100 * n_levels])
        n_levels = seg.shape[0]
        s_bank = q_bank.max(axis=1) / (100.0 * n_levels)
        s = (1.0 - w) * image_score(det, anchors) + w * s_bank
        return pix, s

    if mesh is None:
        _jitted = jax.jit(_impl)

        def predict(image_adapter, images, anchors, M, bank):
            return _jitted(feats_fn.visual, image_adapter, images, anchors,
                           M, bank)
    else:
        from aaclip_tpu.parallel import sharding as sh

        repl = sh.replicated(mesh)
        bsh = sh.batch_sharding(mesh)
        _jitted = jax.jit(
            _impl, in_shardings=(repl, repl, bsh, repl, repl, repl),
            out_shardings=(bsh, bsh))
        dp = mesh.devices.size

        def predict(image_adapter, images, anchors, M, bank):
            if images.shape[0] % dp:  # not an assert: python -O would
                # strip it and surface an opaque GSPMD sharding error
                raise ValueError(
                    f"batch {images.shape[0]} not divisible by "
                    f"data-parallel size {dp}")
            return _jitted(feats_fn.visual, image_adapter, images, anchors,
                           M, bank)

    predict.features_fn = feats_fn
    predict.mesh = mesh
    # all-arguments form (visual first) for jax.export / callers that
    # re-jit: re-jitting `predict` would bake the captured frozen trunk
    # into the outer graph as constants
    predict.raw = _jitted
    predict.visual = feats_fn.visual
    return predict


def support_records(records, k: int):
    """First ``k`` NORMAL records (label 0), in metadata order — the
    deterministic support draw (the reference's few-shot jsonl files are
    already subsampled, so 'first k normals' is stable across runs)."""
    normals = [r for r in records if r.label == 0]
    if not normals:
        raise ValueError("no normal (label 0) records to build a "
                         "memory bank from")
    return normals[:k]


def collect_support_sets(dataset: str, shot: int, img_size: int, *,
                        uint8: bool = False, log=None) -> dict:
    """class -> [k, 3, S, S] support images: the ONE support-draw used by
    test.py --memory_bank and the artifact exporter — the dataset's
    k-shot train metadata when it exists (the reference's pre-subsampled
    few-shot files), else the first ``shot`` normals of the full-shot
    metadata.  Classes absent from the metadata are skipped (their test
    splits are empty too)."""
    import os

    from aaclip_tpu.data.datasets import (TestDataset, metadata_path,
                                          read_jsonl)
    from aaclip_tpu.data.registry import CLASS_NAMES, DATASETS

    meta = metadata_path(dataset, shot)
    if not os.path.exists(meta):
        meta = metadata_path(dataset, -1)
    if not os.path.exists(meta):
        # say what is actually missing: a raw FileNotFoundError from
        # read_jsonl would bury the AACLIP_METADATA hint
        raise FileNotFoundError(
            f"no train metadata for {dataset!r} (looked for "
            f"{metadata_path(dataset, shot)} and {meta}) — the memory "
            "bank draws support images from training metadata; set "
            "AACLIP_DATA/AACLIP_METADATA on this host")
    records = read_jsonl(meta)
    spec = DATASETS[dataset]
    support = {}
    for class_name in CLASS_NAMES[dataset]:
        cls_records = [r for r in records if r.class_name == class_name]
        if not cls_records:
            continue
        recs = support_records(cls_records, shot)
        sds = TestDataset(spec, recs, img_size, class_name, uint8=uint8)
        support[class_name] = np.stack(
            [sds.get(i)["image"] for i in range(len(sds))])
        if len(recs) < shot and log is not None:
            log.warning("memory_bank: class %s has only %d normal "
                        "training images (< --shot %d)", class_name,
                        len(recs), shot)
    return support


def pad_banks_to_common_size(banks: dict, n_max: int | None = None) -> dict:
    """Pad each class's [n, N, D] bank to the max N (or the given
    ``n_max``) with repeats of its first vector (a repeated vector can
    never raise a running max — bank_grid_scores uses the same padding
    internally), so ONE exported graph signature serves every class."""
    import jax.numpy as jnp

    if n_max is None:
        n_max = max(b.shape[1] for b in banks.values())
    out = {}
    for cls, b in banks.items():
        pad = n_max - b.shape[1]
        if pad:
            b = jnp.concatenate(
                [b, jnp.broadcast_to(b[:, :1, :],
                                     (b.shape[0], pad, b.shape[2]))],
                axis=1)
        out[cls] = b
    return out

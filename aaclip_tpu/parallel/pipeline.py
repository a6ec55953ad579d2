"""Pipeline parallelism (GPipe-style): eval, stage-2 training, and the
stage-1 surgery-feature trunk.

The AA-CLIP eval forward taps the residual stream at evenly spaced depths
(``levels`` = 6/12/18/24 of 24 for ViT-L — reference model/adapter.py:80-86)
and reduces each tap through a per-level head before summing the level
maps.  That structure makes the trunk *naturally* pipelineable on a TPU
device ring: split the stacked blocks into ``pp`` contiguous stages whose
boundaries land on tap depths, stream microbatches through the stages with
``ppermute`` (GPipe schedule: ``n_micro + pp - 1`` ticks, bubble fraction
``(pp-1)/(n_micro+pp-1)``), and run each tap's head *stage-locally* — the
final sum over levels then becomes a single ``psum`` over the stage axis.
No activation ever needs gathering: the only inter-device traffic is the
[B_micro, S, D] residual stream hop per tick plus one map-sized psum.

Expressed with ``jax.shard_map`` over a 1-D ``('stage',)`` mesh — explicit
per-device code + collectives, the TPU-native complement of the GSPMD
tensor/sequence parallelism in ``parallel/tensor.py``.  The reference is
strictly single-GPU; this subsystem (like the rest of ``parallel/``) is a
TPU-native extension.

When to use which axis (docs/PERFORMANCE.md "Tensor parallelism"): data
parallelism is throughput-optimal for this workload; tensor parallelism
minimizes per-image latency; pipeline parallelism holds only ``layers/pp``
blocks of weights per device (the axis that matters when a future backbone
exceeds single-chip HBM) while keeping whole blocks intact — so unlike TP
it composes with the single-shard Pallas attention kernels.

Adapter handling keeps every stage's program identical (SPMD): the blend
weight becomes a per-layer vector (``image_adapt_weight`` for adapted
layers, 0 elsewhere), adapter parameter stacks are padded with dummies to
the full depth, and a ``where`` keeps zero-weight layers bit-identical to
the unadapted path.

Known limitation: the build step (``_stage_split`` + the retained
``predict.visual``) materializes one full unsharded copy of the trunk on
the source device before resharding.  Irrelevant at ViT-L scale (1.7 GB
vs 16 GB HBM); for a backbone that genuinely exceeds single-chip HBM the
build would need sharded parameter *generation* (init directly into the
per-stage shards), which this repo does not implement.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aaclip_tpu.core.config import AdapterConfig, CLIPConfig, DtypePolicy
from aaclip_tpu.models import layers as L
from aaclip_tpu.models.vit import embed


def make_pp_mesh(pp: int, dp: int = 1) -> Mesh:
    """``('stage', 'data')`` mesh over the first ``pp * dp`` devices.

    The stage axis is the pipeline ring: devices are laid out so that
    stage-adjacent devices (the per-tick ``ppermute`` hop, which moves the
    [B_micro, S, D] residual every tick) are NEIGHBOURS in device order
    for every data-parallel replica — ``mesh.devices[s, d] =
    devices[d * pp + s]``, i.e. each replica owns a contiguous run of
    ``pp`` devices.  (A plain ``reshape(pp, dp)`` would place stage
    neighbours ``dp`` apart, routing every tick across non-adjacent ICI
    links on real hardware.)  The data axis (default size 1) replicates
    the pipeline and shards the batch — ``test.py --pipeline_parallel N
    --data_parallel``."""
    devices = jax.devices()
    n = len(devices)
    if pp < 2 or pp > n:
        raise ValueError(f"pipeline_parallel={pp} needs 2..{n} devices")
    if dp < 1 or pp * dp > n:
        raise ValueError(
            f"pipeline dp={dp} needs pp*dp <= {n} devices (pp={pp})")
    return Mesh(
        np.asarray(devices[:pp * dp]).reshape(dp, pp).T, ("stage", "data"))


def _validate(cfg: CLIPConfig, acfg: AdapterConfig, pp: int) -> int:
    """Check the level structure is pipelineable; returns taps per stage."""
    v = cfg.vision
    levels = tuple(acfg.levels)
    n_lev = len(levels)
    if n_lev == 0:
        raise ValueError("pipeline parallelism needs at least one level")
    if v.layers % n_lev:
        raise ValueError(
            f"pipeline parallelism needs evenly spaced levels: {n_lev} "
            f"levels do not divide {v.layers} layers")
    spacing = v.layers // n_lev
    expect = tuple(spacing * (i + 1) for i in range(n_lev))
    if levels != expect:
        raise ValueError(
            f"pipeline parallelism needs evenly spaced levels ending at the "
            f"last layer (got {levels}, need {expect})")
    if n_lev % pp:
        raise ValueError(
            f"pipeline_parallel={pp} must divide the level count {n_lev} "
            f"(stage boundaries sit on tap depths)")
    return n_lev // pp


def _stage_split(tree, pp: int, Ls: int):
    """[L, ...] stacked leaves -> [pp, L/pp, ...] (leading stage axis)."""
    return jax.tree.map(lambda a: a.reshape((pp, Ls) + a.shape[1:]), tree)


def _pad_adapters(layer_adapters, pp: int, Ls: int, total_layers: int,
                  n_adapt: int):
    """[n_adapt, ...] trainable stack -> [pp, L/pp, ...] with finite
    dummies for unadapted layers (their blend weight is 0; under autodiff
    the ``where`` on the blend weight keeps the dummies' cotangents zero
    and the concatenate transpose drops them).

    The stack depth must equal ``acfg.image_adapt_until`` (``n_adapt``):
    the blend gate here is config-driven, so a mismatched stack would
    silently blend dummy adapters into adapted layers — or silently
    ignore trained ones — instead of failing like the single-device
    trunk does."""
    def pad(a):
        if a.shape[0] != n_adapt:
            raise ValueError(
                f"adapter stack depth {a.shape[0]} != image_adapt_until="
                f"{n_adapt} — pass the AdapterConfig these adapters were "
                "built with")
        fill = jnp.ones((total_layers - n_adapt,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, fill]).reshape((pp, Ls) + a.shape[1:])
    return jax.tree.map(pad, layer_adapters)


def _adapt_weight_vector(cfg: CLIPConfig, acfg: AdapterConfig) -> jax.Array:
    """Per-layer blend weights: adapted layers get the configured weight,
    the rest 0 — keeps every stage's program identical (SPMD)."""
    return jnp.where(
        jnp.arange(cfg.vision.layers) < acfg.image_adapt_until,
        jnp.float32(acfg.image_adapt_weight), jnp.float32(0.0))


def _make_block_body(cfg: CLIPConfig, policy: DtypePolicy, act, attn_fn):
    """scan body for one adapted block: residual block + norm-matched
    adapter blend gated by the per-layer weight (zero-weight layers stay
    bit-identical to the unadapted path via the ``where``)."""
    heads = cfg.vision.heads

    def body(hh, per):
        b, ad, wl = per
        hh = L.residual_block(hh, b, heads, act=act, policy=policy,
                              attn_fn=attn_fn)
        a = L.simple_adapter(hh, ad, policy)
        # the shared helper keeps the bf16 blend arithmetic identical to
        # the single-device path (its traced-weight branch casts the
        # coefficients to the stream dtype before blending)
        blended = L.norm_matched_blend(hh, a, wl)
        # gate on wl != 0, not wl > 0: unadapted layers (and dummy
        # adapters) carry EXACTLY 0 and must stay bit-identical with zero
        # cotangents, but a configured NEGATIVE adapt weight is a real
        # blend on the single-device path and must blend here too
        hh = jnp.where(wl != 0, blended.astype(hh.dtype), hh)
        return hh, None

    return body


def make_pipeline_predict_fn(clip_params: dict, cfg: CLIPConfig,
                             acfg: AdapterConfig, *, pp: int,
                             n_micro: Optional[int] = None,
                             dp: int = 1,
                             img_size: int | None = None,
                             policy: DtypePolicy = DtypePolicy(),
                             attn_fn=None) -> Callable:
    """Pipeline-parallel drop-in for ``eval.predict.make_predict_fn``.

    Same call signature — ``(image_adapter, images, anchors, M)`` ->
    ``(pixel_map [B, img, img], image_score [B])`` — and the same math as
    the single-device path (equality pinned in
    tests/test_pipeline_parallel.py), but the trunk's 24 blocks live
    ``layers/pp`` per device on a ``('stage',)`` ring and microbatches
    stream through them GPipe-style.  ``n_micro`` (default ``pp``) sets
    the microbatch count; the batch must divide by it.  ``attn_fn`` is a
    per-shard attention override — whole blocks stay on one device, so the
    packed Pallas kernels plug in unchanged (unlike tensor parallelism).
    Staged-precision trunks (``policy.bf16_until``) are not supported.

    ``dp > 1`` composes with data parallelism on a 2-D ``('stage',
    'data')`` mesh: the ``dp`` pipeline replicas each process a batch
    shard of every microbatch (eval is per-sample separable, so the data
    axis is pure SPMD — the stage ``psum``/``ppermute`` run within each
    replica).  The batch must divide by ``n_micro * dp``.
    """
    from aaclip_tpu.core.params import cast_matmul_weights
    from aaclip_tpu.models.layers import config_act
    from aaclip_tpu.ops.similarity import apply_postproc_matrix, image_score

    if policy.bf16_until:
        raise ValueError("pipeline parallelism does not support the "
                         "staged-precision (bf16_until) trunk")
    if policy.quant_int8:
        raise ValueError("pipeline parallelism does not support the int8 "
                         "quantized trunk")
    tps = _validate(cfg, acfg, pp)
    n_micro = n_micro or pp
    mesh = make_pp_mesh(pp, dp)
    v = cfg.vision
    spacing = v.layers // len(acfg.levels)
    Ls = tps * spacing                       # layers per stage
    img = img_size or v.image_size
    grid = img // v.patch_size
    S = grid * grid + 1
    n_lev = len(acfg.levels)

    visual = cast_matmul_weights(clip_params["visual"], policy)
    # place the stage-split trunk ONCE at build time, sharded over the
    # stage axis (replicated over data): each device then holds only its
    # layers/pp blocks — the memory axis pipeline parallelism exists for.
    # Splitting inside the jitted call would keep the full unsharded tree
    # resident as a jit input alongside the shards.
    stage_sharding = NamedSharding(mesh, P("stage"))
    blocks_staged = jax.device_put(
        _stage_split(visual["blocks"], pp, Ls), stage_sharding)
    visual_rest = {k: v for k, v in visual.items() if k != "blocks"}
    _act = config_act(cfg, policy)
    _pp_prec = "highest" if policy.precision == "highest" else "high"
    w_layers = _adapt_weight_vector(cfg, acfg)
    _block_body = _make_block_body(cfg, policy, _act, attn_fn)

    def _proj(t, w, anchors_m):
        """Per-level head: ln_post'd tokens -> L2-normalized embedding ->
        half-open level map [B_m, grid, grid] (adapted_forward's proj_norm
        + the per-level (s1-s0)/2 + 1/2 term of eval_anomaly_map)."""
        cd = policy.compute_dtype
        y = jnp.dot(t.astype(cd), w.astype(cd),
                    preferred_element_type=jnp.float32,
                    precision=policy.precision)
        if acfg.proj_relu:
            y = L.leaky_relu(y)
        y = L.l2_normalize(y)
        if anchors_m.ndim == 2:
            s = 100.0 * jnp.einsum("blc,ck->blk", y, anchors_m,
                                   preferred_element_type=jnp.float32,
                                   precision="highest")
        else:
            s = 100.0 * jnp.einsum("blc,bck->blk", y, anchors_m,
                                   preferred_element_type=jnp.float32,
                                   precision="highest")
        q = 0.5 * (s[..., 1] - s[..., 0]) + 0.5
        return q.reshape(q.shape[0], grid, grid)

    def stage_fn(blocks, adapters, w_l, seg_w, det_w, ln_post, emb_mb,
                 anchors_mb):
        """Per-device pipeline program (inside shard_map).

        blocks/adapters/w_l/seg_w arrive stage-sliced with a leading
        length-1 stage axis; emb_mb [n_micro, B_m, S, D] and ln_post /
        det_w / anchors_mb are replicated.
        """
        blocks = jax.tree.map(lambda a: a[0], blocks)
        adapters = jax.tree.map(lambda a: a[0], adapters)
        w_l, seg_w = w_l[0], seg_w[0]        # [Ls], [tps, D, E]
        sid = jax.lax.axis_index("stage")
        B_m = emb_mb.shape[1]
        emb_dtype = emb_mb.dtype

        def run_segment(h, seg_idx):
            blk = jax.tree.map(
                lambda a: a[seg_idx * spacing:(seg_idx + 1) * spacing],
                blocks)
            ada = jax.tree.map(
                lambda a: a[seg_idx * spacing:(seg_idx + 1) * spacing],
                adapters)
            wseg = w_l[seg_idx * spacing:(seg_idx + 1) * spacing]
            h, _ = jax.lax.scan(_block_body, h, (blk, ada, wseg))
            return h

        def tick(t, carry):
            act, q_acc, det_acc = carry
            m_in = jnp.clip(t, 0, n_micro - 1)
            h = jnp.where(sid == 0,
                          jax.lax.dynamic_index_in_dim(
                              emb_mb, m_in, keepdims=False),
                          act)
            taps = []
            for k in range(tps):
                h = run_segment(h, k)
                taps.append(h)
            # this stage is processing microbatch t - sid at this tick
            m_self = t - sid
            valid = (m_self >= 0) & (m_self < n_micro)
            m_c = jnp.clip(m_self, 0, n_micro - 1)
            anchors_m = (anchors_mb if anchors_mb.ndim == 2
                         else jax.lax.dynamic_index_in_dim(
                             anchors_mb, m_c, keepdims=False))
            q_t = jnp.zeros((B_m, grid, grid), jnp.float32)
            tokens_last = None
            for k, tap in enumerate(taps):
                tok = L.layer_norm(tap[:, 1:, :], ln_post)
                q_t = q_t + _proj(tok, seg_w[k], anchors_m)
                tokens_last = tok
            # detection head: global last level = last tap of last stage
            cd = policy.compute_dtype
            dy = jnp.dot(tokens_last.astype(cd), det_w.astype(cd),
                         preferred_element_type=jnp.float32,
                         precision=policy.precision)
            if acfg.proj_relu:
                dy = L.leaky_relu(dy)
            det_t = L.l2_normalize(dy).mean(axis=1)
            q_prev = jax.lax.dynamic_index_in_dim(q_acc, m_c, keepdims=False)
            q_acc = jax.lax.dynamic_update_index_in_dim(
                q_acc, jnp.where(valid, q_t, q_prev), m_c, 0)
            d_prev = jax.lax.dynamic_index_in_dim(det_acc, m_c,
                                                  keepdims=False)
            det_acc = jax.lax.dynamic_update_index_in_dim(
                det_acc,
                jnp.where(valid & (sid == pp - 1), det_t, d_prev), m_c, 0)
            act = jax.lax.ppermute(
                h, "stage", [(i, (i + 1) % pp) for i in range(pp)])
            return act, q_acc, det_acc

        E = det_w.shape[-1]
        # the carry becomes device-varying on the first tick (axis_index
        # selects per-stage work; the batch shard is data-varying) — mark
        # the init accordingly (shard_map's varying-manual-axes typing)
        def _mark(a):
            a = jax.lax.pcast(a, "stage", to="varying")
            return jax.lax.pcast(a, "data", to="varying")

        init = jax.tree.map(
            _mark,
            (jnp.zeros((B_m, S, v.width), emb_dtype),
             jnp.zeros((n_micro, B_m, grid, grid), jnp.float32),
             jnp.zeros((n_micro, B_m, E), jnp.float32)))
        _, q_acc, det_acc = jax.lax.fori_loop(
            0, n_micro + pp - 1, tick, init)
        # each stage wrote its own levels' partial maps; the level sum is
        # one psum over the ring (det is nonzero on the last stage only)
        return (jax.lax.psum(q_acc, "stage"),
                jax.lax.psum(det_acc, "stage"))

    stage_spec = P("stage")
    data_spec = P(None, "data")    # [n_micro, B, ...] sharded on batch
    _sharded = {}

    def _get_sharded(per_sample_anchors: bool):
        if per_sample_anchors not in _sharded:
            _sharded[per_sample_anchors] = jax.shard_map(
                stage_fn, mesh=mesh,
                in_specs=(stage_spec, stage_spec, stage_spec, stage_spec,
                          P(), P(), data_spec,
                          data_spec if per_sample_anchors else P()),
                out_specs=(data_spec, data_spec))
        return _sharded[per_sample_anchors]

    def _predict_impl(visual_rest, blocks_staged, image_adapter, images,
                      anchors, M):
        B = images.shape[0]
        if B % (n_micro * dp):  # also guards the .raw/.raw_parts callers
            raise ValueError(
                f"batch {B} not divisible by n_micro={n_micro}"
                + (f" * dp={dp}" if dp > 1 else ""))
        sharded = _get_sharded(anchors.ndim == 3)
        x = embed(visual_rest, cfg, images, policy)      # [B, S, D]
        emb_mb = x.reshape(n_micro, B // n_micro, S, v.width)
        adapters_staged = _pad_adapters(image_adapter["layer_adapters"],
                                        pp, Ls, v.layers,
                                        acfg.image_adapt_until)
        seg_w = jnp.stack([image_adapter["seg_proj"][i]["w"]
                           for i in range(n_lev)])       # [n_lev, D, E]
        seg_w = seg_w.reshape((pp, tps) + seg_w.shape[1:])
        anchors_mb = anchors
        if anchors.ndim == 3:
            anchors_mb = anchors.reshape((n_micro, B // n_micro)
                                         + anchors.shape[1:])
        q, det = sharded(blocks_staged, adapters_staged,
                         w_layers.reshape(pp, Ls), seg_w,
                         image_adapter["det_proj"]["w"],
                         visual_rest["ln_post"], emb_mb, anchors_mb)
        q = q.reshape(B, grid, grid)
        det = det.reshape(B, -1)
        pix = apply_postproc_matrix(q, M, precision=_pp_prec)
        return pix, image_score(det, anchors)

    _predict = jax.jit(_predict_impl)

    def predict(image_adapter, images, anchors, M):
        B = images.shape[0]
        if B % (n_micro * dp):
            raise ValueError(
                f"batch {B} not divisible by n_micro={n_micro}"
                + (f" * dp={dp}" if dp > 1 else ""))
        return _predict(visual_rest, blocks_staged, image_adapter,
                        jnp.asarray(images), jnp.asarray(anchors),
                        jnp.asarray(M))

    def _raw(visual, image_adapter, images, anchors, M):
        # eval.predict's .raw contract: (visual, adapter, images, anchors,
        # M) with the FULL visual tree — stage-split the blocks in-trace (a
        # reshape, free under jit) so the drop-in claim holds for callers
        # that re-jit the all-arguments form themselves
        rest = {k: v for k, v in visual.items() if k != "blocks"}
        return _predict_impl(rest, _stage_split(visual["blocks"], pp, Ls),
                             image_adapter, images, anchors, M)

    predict.raw = jax.jit(_raw)
    predict.visual = visual  # full cast tree, like eval.predict's .visual
    predict.raw_parts = _predict  # pre-staged form predict() itself uses
    predict.blocks_staged = blocks_staged
    predict.mesh = None          # inputs are replicated; jit places them
    predict.pp = pp
    predict.dp = dp
    predict.n_micro = n_micro
    return predict


def make_pp_stage1_features_fn(clip_params: dict, cfg: CLIPConfig, *,
                               pp: int, n_micro: Optional[int] = None,
                               dp: int = 1,
                               surgery_until_layer: int = 20,
                               policy: DtypePolicy = DtypePolicy(),
                               attn_fn=None, vv_attn_fn=None,
                               vv_mode: str = "batch") -> Callable:
    """Pipeline-parallel drop-in for ``train.steps.stage1_features_fn``.

    Same call signature — ``features(images, valid=None) ->
    [B, n_patches, embed_dim]`` stage-1 supervision features (reference
    train.py:74-85: last-level surgery patch embedding, L2-normalized,
    plus the frozen tower's normalized CLS token) — but the trunk lives
    ``layers/pp`` blocks per device on the ``('stage',)`` ring and
    microbatches stream through GPipe-style.  Grad-free (the stage-1
    gradient path is the text tower), so no remat and the Pallas kernels
    plug in via ``attn_fn`` / ``vv_attn_fn``.

    The carry is a DUAL residual stream: after the shared prefix (blocks
    ``[0, vv_start)`` are identical in the surgery and frozen towers —
    see stage1_features_fn's fusion note) the V-V tail and the standard
    tail diverge, so each tick hops two [B_m, S, D] activations.  The
    V-V/shared boundary rarely lands on a stage edge; a per-layer
    ``lax.cond`` keeps the prefix fused (the V-V stream is a free
    pass-through of the standard stream until ``vv_start``) while every
    stage runs the same SPMD program.  The head (ln_post -> @proj -> L2)
    runs on the last stage only; the output leaves through a
    stage-indexed ``out_specs`` slice rather than a psum — features are
    activation-sized ([B, 1369, 768] at ViT-L/518), so a ring psum would
    move pp copies of them where one shard suffices.

    ``vv_mode="batch"`` (reference-exact layout quirk, batch-coupled):
    under pipelining the coupling unit is the MICROBATCH — each
    microbatch's cross-batch softmax sees its own B/n_micro samples, so
    the features equal the single-device batch-mode run on each
    microbatch slice (equality-pinned in tests/test_pipeline_parallel.py;
    ``n_micro=1`` recovers full-batch coupling at the cost of a
    (pp-1)/pp bubble).  ``valid`` masks pad rows out of each microbatch's
    softmax, matching the single-device masked-tail semantics per
    microbatch.  Batch mode rejects ``dp > 1``: the shard_map pipeline
    would silently couple within data shards (the GSPMD data-parallel
    path in stage1_features_fn handles that case with an all-gather).
    ``vv_mode="spatial"`` is per-sample and exact at any (n_micro, dp).
    """
    from aaclip_tpu.models.layers import config_act

    policy = policy.unstaged()  # staging is inference-only (steps.py)
    v = cfg.vision
    heads = cfg.vision.heads
    if pp < 2:
        raise ValueError(f"pipeline_parallel={pp} needs >= 2 stages")
    if v.layers % pp:
        raise ValueError(
            f"pipeline_parallel={pp} must divide the {v.layers}-layer "
            "tower (stage-1 has no tap constraint, but stages must be "
            "equal-sized)")
    if vv_mode not in ("batch", "spatial"):
        raise ValueError(
            f"vv_mode must be 'batch' or 'spatial', got {vv_mode!r}")
    if vv_mode == "batch":
        if vv_attn_fn is not None:
            raise ValueError(
                "a custom vv_attn_fn requires vv_mode='spatial': the "
                "default batch mode installs the reference-exact "
                "batch-coupled kernel and would silently replace yours")
        if dp > 1:
            raise ValueError(
                "vv_mode='batch' does not compose with dp > 1: the "
                "batch-coupled V-V softmax would couple within each data "
                "shard only; use vv_mode='spatial' or dp=1 (plain "
                "data-parallel stage-1 — stage1_features_fn with a data "
                "mesh — handles batch mode via GSPMD)")
    n_micro = n_micro or pp
    mesh = make_pp_mesh(pp, dp)
    Ls = v.layers // pp
    vv_start = L.surgery_vv_start(v.layers, surgery_until_layer)
    img = v.image_size
    grid = img // v.patch_size
    S = grid * grid + 1
    _act = config_act(cfg, policy)
    visual = clip_params["visual"]
    blocks_staged = jax.device_put(
        _stage_split(visual["blocks"], pp, Ls),
        NamedSharding(mesh, P("stage")))
    visual_rest = {k: w for k, w in visual.items() if k != "blocks"}
    # per-layer V-V flags, stage-sliced like the blocks ([pp, Ls] bool)
    vv_flags = np.arange(v.layers).reshape(pp, Ls) >= vv_start
    E = visual["proj"].shape[-1]
    cd = policy.compute_dtype

    def _proj(t, w):
        return jnp.dot(t.astype(cd), w.astype(cd),
                       preferred_element_type=jnp.float32,
                       precision=policy.precision)

    def stage_fn(blocks, flags, ln_post, proj_w, emb_mb, valid_mb):
        """Per-device pipeline program (inside shard_map).

        blocks/flags arrive stage-sliced with a leading length-1 stage
        axis; emb_mb [n_micro, B_m, S, D] and valid_mb [n_micro, B_m]
        are data-sharded, ln_post/proj replicated.
        """
        blocks = jax.tree.map(lambda a: a[0], blocks)
        flags = flags[0]                                 # [Ls] bool
        sid = jax.lax.axis_index("stage")
        B_m = emb_mb.shape[1]

        def tick(t, carry):
            hv, hs, acc = carry
            m_in = jnp.clip(t, 0, n_micro - 1)
            inj = jax.lax.dynamic_index_in_dim(emb_mb, m_in, keepdims=False)
            hv = jnp.where(sid == 0, inj, hv)
            hs = jnp.where(sid == 0, inj, hs)
            m_self = t - sid
            write = ((m_self >= 0) & (m_self < n_micro)
                     & (sid == pp - 1))
            m_c = jnp.clip(m_self, 0, n_micro - 1)
            val = jax.lax.dynamic_index_in_dim(valid_mb, m_c,
                                               keepdims=False)  # [B_m]
            if vv_mode == "batch":
                # all-ones valid is bit-identical to unmasked (the mask
                # is a where on the scores), so one program serves both
                vv_fn = L.make_batch_vv_attn_fn(heads, policy, valid=val)
            else:
                vv_fn = vv_attn_fn

            def layer(carry2, per):
                h_v, h_s = carry2
                blk, flag = per
                h_s2 = L.residual_block(h_s, blk, heads, act=_act,
                                        policy=policy, attn_fn=attn_fn)
                # shared-prefix fusion under SPMD: before vv_start the
                # V-V stream IS the standard stream, so the false branch
                # passes it through for free; lax.cond executes only one
                # branch per device even with this stage-varying flag
                h_v2 = jax.lax.cond(
                    flag,
                    lambda h: L.residual_block(
                        h, blk, heads, vv=True, act=_act, policy=policy,
                        attn_fn=attn_fn, vv_attn_fn=vv_fn),
                    lambda h: h_s2, h_v)
                return (h_v2, h_s2), None

            (hv, hs), _ = jax.lax.scan(layer, (hv, hs), (blocks, flags))
            # head: cheap relative to Ls blocks; computed every tick,
            # write-gated to the last stage's live microbatch (the eval
            # path's det-head pattern)
            feats = _proj(L.layer_norm(hv[:, 1:, :], ln_post), proj_w)
            cls = L.l2_normalize(
                _proj(L.layer_norm(hs[:, 0, :], ln_post), proj_w))
            out_t = L.l2_normalize(feats) + cls[:, None, :]
            prev = jax.lax.dynamic_index_in_dim(acc, m_c, keepdims=False)
            acc = jax.lax.dynamic_update_index_in_dim(
                acc, jnp.where(write, out_t, prev), m_c, 0)
            ring = [(i, (i + 1) % pp) for i in range(pp)]
            return (jax.lax.ppermute(hv, "stage", ring),
                    jax.lax.ppermute(hs, "stage", ring), acc)

        # seed the streams with real data (emb_mb is data-varying; mark
        # stage-varying) — see make_pp_stage2_step's NaN note; grad-free
        # here, but l2_normalize(0) in bubble head ticks is still best
        # avoided
        seed = jax.lax.pcast(emb_mb[0], "stage", to="varying")
        acc0 = jnp.zeros((n_micro, B_m, S - 1, E), jnp.float32)
        acc0 = jax.lax.pcast(
            jax.lax.pcast(acc0, "stage", to="varying"), "data",
            to="varying")
        _, _, acc = jax.lax.fori_loop(
            0, n_micro + pp - 1, tick, (seed, seed, acc0))
        # leading length-1 stage axis: the caller slices stage pp-1 out of
        # the stage-major output instead of psumming activation-sized
        # features around the ring
        return acc[None]

    sharded = jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=(P("stage"), P("stage"), P(), P(),
                  P(None, "data"), P(None, "data")),
        out_specs=P("stage", None, "data"))

    def _features_impl(visual_rest, blocks_staged, images, valid):
        B = images.shape[0]
        if B % (n_micro * dp):  # trace-time: guards jitted callers too
            raise ValueError(
                f"batch {B} not divisible by n_micro={n_micro}"
                + (f" * dp={dp}" if dp > 1 else ""))
        x = embed(visual_rest, cfg, images, policy)
        emb_mb = x.reshape(n_micro, B // n_micro, S, v.width)
        valid_mb = valid.reshape(n_micro, B // n_micro)
        res = sharded(blocks_staged, jnp.asarray(vv_flags),
                      visual_rest["ln_post"], visual_rest["proj"],
                      emb_mb, valid_mb)
        return res[pp - 1].reshape(B, S - 1, E)

    _features = jax.jit(_features_impl)

    def features(images, valid=None):
        images = jnp.asarray(images)
        B = images.shape[0]
        if B % (n_micro * dp):
            raise ValueError(
                f"batch {B} not divisible by n_micro={n_micro}"
                + (f" * dp={dp}" if dp > 1 else ""))
        if valid is None:
            valid = jnp.ones((B,), jnp.float32)
        return _features(visual_rest, blocks_staged, images,
                         jnp.asarray(valid, jnp.float32))

    features.blocks_staged = blocks_staged
    features.pp = pp
    features.dp = dp
    features.n_micro = n_micro
    features.vv_mode = vv_mode
    return features


def make_pp_stage2_step(clip_params: dict, cfg: CLIPConfig,
                        acfg: AdapterConfig, tx, anchors_table, *, pp: int,
                        n_micro: Optional[int] = None, dp: int = 1,
                        img_size: int | None = None,
                        policy: DtypePolicy = DtypePolicy(),
                        attn_fn=None, remat: bool = True) -> Callable:
    """Pipeline-parallel drop-in for ``train.steps.make_stage2_step``.

    Same step signature — ``(state, images, mask, label, class_idx,
    valid) -> (state, loss)`` — but the forward AND backward stream
    GPipe-style through the ``('stage',)`` ring: the stage-2 loss is
    additive over levels (CE on the detection token + per-level seg
    losses, reference train.py:117-174), so each stage computes its own
    levels' loss terms locally, the total is one scalar ``psum``, and
    ``jax.grad`` differentiates straight through the shard_map /
    ``ppermute`` schedule (the ppermute transpose is the reverse hop, so
    backward microbatches counter-stream through the ring — 1F1B falls
    out of AD rather than being hand-scheduled).

    Loss semantics match ``grad_accum=n_micro``: the reported loss and
    applied gradient are the MEAN over LIVE (any-valid) microbatches,
    equal to the big-batch step for full batches (per-sample-mean loss
    terms; ragged final batches weight each microbatch's valid samples
    equally, and all-padding microbatches — zero gradient, constant dice
    terms — are excluded from both the loss and the normalizer).

    ``remat=True`` (default) wraps each block in ``jax.checkpoint`` —
    with the GPipe schedule the per-device backward otherwise stores
    every in-flight microbatch's block internals.  The Pallas custom-VJP
    attention composes via ``attn_fn`` (whole blocks stay on one
    device).  Adapter/optimizer state stays in the canonical (unstaged)
    layout: staging/padding happens inside the differentiated loss, so
    checkpoints and resume interop with every other trainer path.

    ``dp > 1`` composes with data parallelism on the ``('stage','data')``
    mesh.  Unlike eval, the training loss is NOT per-sample separable
    (every term is a mean over the GLOBAL valid count), so each data
    shard contributes numerator SUMS and its valid count, both psummed
    over the data axis before the division — the decomposition is
    algebraically exact, and the adapter-gradient psum over data falls
    out of the shard_map transpose (replicated-input cotangents).  The
    batch must divide by ``n_micro * dp``.
    """
    import functools

    from aaclip_tpu.models.layers import config_act
    from aaclip_tpu.ops import losses as LL
    from aaclip_tpu.ops.resize import bilinear_matrix
    from aaclip_tpu.ops.similarity import apply_postproc_matrix
    from aaclip_tpu.train.steps import TrainState

    import optax

    policy = policy.unstaged()
    tps = _validate(cfg, acfg, pp)
    n_micro = n_micro or pp
    mesh = make_pp_mesh(pp, dp)
    v = cfg.vision
    spacing = v.layers // len(acfg.levels)
    Ls = tps * spacing
    img = img_size or v.image_size
    grid = img // v.patch_size
    S = grid * grid + 1
    n_lev = len(acfg.levels)
    anchors_table = jnp.asarray(anchors_table)
    # stage-split the frozen trunk once, sharded over the stage axis —
    # same rationale as make_pipeline_predict_fn: each device holds only
    # its layers/pp blocks instead of (shards + the full jit-input tree)
    blocks_staged = jax.device_put(
        _stage_split(clip_params["visual"]["blocks"], pp, Ls),
        NamedSharding(mesh, P("stage")))
    visual_rest = {k: v for k, v in clip_params["visual"].items()
                   if k != "blocks"}
    _act = config_act(cfg, policy)
    _body = _make_block_body(cfg, policy, _act, attn_fn)
    if isinstance(remat, str):
        # make_stage2_step accepts remat='selective'; silently treating the
        # string as truthy here would hand a porting caller FULL remat (a
        # ~35% step-time regression) with no signal — reject like the other
        # unsupported combinations in this file
        raise ValueError(
            f"make_pp_stage2_step supports remat=True/False only, got "
            f"{remat!r} (selective remat is a make_stage2_step feature; "
            "the pipeline trainer recomputes whole blocks)")
    if remat:
        _body = jax.checkpoint(_body)
    w_layers = _adapt_weight_vector(cfg, acfg)
    U_np = bilinear_matrix(grid, img, align_corners=True)

    def stage_fn(blocks, adapters, w_l, seg_w, det_w, ln_post, emb_mb,
                 banchors_mb, mask_mb, label_mb, valid_mb):
        """Per-device pipeline loss (inside shard_map) -> scalar sum of
        per-microbatch losses (this stage's level terms; psummed)."""
        blocks = jax.tree.map(lambda a: a[0], blocks)
        adapters = jax.tree.map(lambda a: a[0], adapters)
        w_l, seg_w = w_l[0], seg_w[0]        # [Ls], [tps, D, E]
        sid = jax.lax.axis_index("stage")
        B_m = emb_mb.shape[1]
        U = jnp.asarray(U_np)
        cd = policy.compute_dtype

        def run_segment(h, seg_idx):
            sl = lambda a: a[seg_idx * spacing:(seg_idx + 1) * spacing]
            h, _ = jax.lax.scan(
                _body, h, (jax.tree.map(sl, blocks),
                           jax.tree.map(sl, adapters), sl(w_l)))
            return h

        def proj_norm(tok, w):
            y = jnp.dot(tok.astype(cd), w.astype(cd),
                        preferred_element_type=jnp.float32,
                        precision=policy.precision)
            if acfg.proj_relu:
                y = L.leaky_relu(y)
            return L.l2_normalize(y)

        def seg_loss_psummed(d, m, val, nv):
            """seg_loss_from_logit_masked with the per-sample-mean
            divisions deferred until after a data-axis psum of the
            numerator sums — algebraically exact under batch sharding
            (identical to the single-shard form at dp=1)."""
            d = d.astype(jnp.float32)
            m = m.reshape(d.shape).astype(jnp.float32)
            vv = val.astype(jnp.float32)
            per_pixel = LL._focal_terms_from_logit(d, m)
            f_num = jax.lax.psum(
                jnp.sum(per_pixel * vv[:, None, None]), "data")
            focal = f_num / (nv * per_pixel.shape[1] * per_pixel.shape[2])
            p1 = jax.nn.sigmoid(d)
            e0 = jax.lax.psum(
                jnp.sum(LL._dice_eff(1.0 - p1, 1.0 - m) * vv), "data")
            e1 = jax.lax.psum(jnp.sum(LL._dice_eff(p1, m) * vv), "data")
            return focal + (1.0 - e0 / nv) + (1.0 - e1 / nv)

        def tick(carry, t):
            act, loss_acc = carry
            m_in = jnp.clip(t, 0, n_micro - 1)
            h = jnp.where(sid == 0,
                          jax.lax.dynamic_index_in_dim(
                              emb_mb, m_in, keepdims=False),
                          act)
            taps = []
            for k in range(tps):
                h = run_segment(h, k)
                taps.append(h)
            m_self = t - sid
            tick_w = ((m_self >= 0) & (m_self < n_micro)).astype(
                jnp.float32)
            m_c = jnp.clip(m_self, 0, n_micro - 1)
            pick = lambda a: jax.lax.dynamic_index_in_dim(
                a, m_c, keepdims=False)
            ban, msk, lbl, val = (pick(banchors_mb), pick(mask_mb),
                                  pick(label_mb), pick(valid_mb))
            # global valid count for this microbatch (the loss terms are
            # means over ALL valid samples, not per-shard means)
            nv_raw = jax.lax.psum(jnp.sum(val.astype(jnp.float32)), "data")
            nv = jnp.maximum(nv_raw, 1.0)
            # an all-padding microbatch contributes constant dice terms
            # (2.0/level) and zero gradient — gate it out, mirroring the
            # grad_accum scan in train/steps.py (normalization by the live
            # count happens after the tick loop)
            live = (nv_raw > 0).astype(jnp.float32)
            loss_t = jnp.float32(0.0)
            tok = None
            for k, tap in enumerate(taps):
                tok = L.layer_norm(tap[:, 1:, :], ln_post)
                y = proj_norm(tok, seg_w[k])
                # level_scores + train_similarity_logit, stage-locally
                s = 100.0 * jnp.einsum("blc,bck->blk", y, ban,
                                       preferred_element_type=jnp.float32,
                                       precision="highest")
                d = (s[..., 1] - s[..., 0]).reshape(B_m, grid, grid)
                d = apply_postproc_matrix(d, U)
                loss_t = loss_t + seg_loss_psummed(d, msk, val, nv)
            # detection CE: global last level = last tap of the last stage
            det = proj_norm(tok, det_w).mean(axis=1)
            logits = jnp.einsum("bd,bdk->bk", det, ban,
                                preferred_element_type=jnp.float32,
                                precision=policy.precision)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(
                logp, lbl[:, None].astype(jnp.int32), axis=1)[:, 0]
            ce = jax.lax.psum(
                jnp.sum(nll * val.astype(jnp.float32)), "data") / nv
            loss_t = loss_t + jnp.where(sid == pp - 1, ce, 0.0)
            loss_acc = loss_acc + tick_w * live * loss_t
            act = jax.lax.ppermute(
                h, "stage", [(i, (i + 1) % pp) for i in range(pp)])
            return (act, loss_acc), None

        # seed the carry with REAL data, not zeros: a zero carry stays
        # exactly zero through zero-bias towers, and the bubble ticks'
        # heads then hit l2_normalize(0) — whose VJP turns the (exactly
        # zero) discarded cotangents into 0*inf = NaN that poisons the
        # last stage's head gradients.  With a generic finite seed every
        # bubble tick differentiates cleanly and its contribution is
        # exactly zeroed by tick_w.
        # emb_mb arrives data-sharded (already data-varying); both carry
        # legs become stage-varying on the first tick
        init = (jax.lax.pcast(emb_mb[0], "stage", to="varying"),
                jax.lax.pcast(jnp.zeros((), jnp.float32), "stage",
                              to="varying"))
        (_, loss_acc), _ = jax.lax.scan(
            tick, init, jnp.arange(n_micro + pp - 1))
        # mean over LIVE microbatches (== n_micro for full batches),
        # matching the grad_accum scan's normalization exactly
        nv_all = jax.lax.psum(
            jnp.sum(valid_mb.astype(jnp.float32), axis=1), "data")
        n_live = jnp.maximum(jnp.sum((nv_all > 0).astype(jnp.float32)), 1.0)
        return jax.lax.psum(loss_acc, "stage") / n_live

    stage_spec = P("stage")
    data_spec = P(None, "data")    # [n_micro, B, ...] sharded on batch
    sharded = jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=(stage_spec,) * 4 + (P(), P()) + (data_spec,) * 5,
        out_specs=P())

    def loss_fn(image_adapter, visual_rest, blocks_staged, images, mask,
                label, class_idx, valid):
        B = images.shape[0]
        if B % (n_micro * dp):  # trace-time: guards jitted callers too
            raise ValueError(
                f"batch {B} not divisible by n_micro={n_micro}"
                + (f" * dp={dp}" if dp > 1 else ""))
        B_m = B // n_micro
        x = embed(visual_rest, cfg, images, policy)
        emb_mb = x.reshape(n_micro, B_m, S, v.width)
        adapters_staged = _pad_adapters(image_adapter["layer_adapters"],
                                        pp, Ls, v.layers,
                                        acfg.image_adapt_until)
        seg_w = jnp.stack([image_adapter["seg_proj"][i]["w"]
                           for i in range(n_lev)])
        seg_w = seg_w.reshape((pp, tps) + seg_w.shape[1:])
        banchors = anchors_table[class_idx]              # [B, D, 2]
        mb = lambda a: a.reshape((n_micro, B_m) + a.shape[1:])
        return sharded(blocks_staged, adapters_staged,
                       w_layers.reshape(pp, Ls), seg_w,
                       image_adapter["det_proj"]["w"],
                       visual_rest["ln_post"],
                       emb_mb, mb(banchors), mb(mask), mb(label), mb(valid))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, visual_rest, blocks_staged, images, mask,
              label, class_idx, valid):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, visual_rest, blocks_staged, images, mask, label,
            class_idx, valid)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def step(state, images, mask, label, class_idx, valid):
        B = images.shape[0]
        if B % (n_micro * dp):
            raise ValueError(
                f"batch {B} not divisible by n_micro={n_micro}"
                + (f" * dp={dp}" if dp > 1 else ""))
        return _step(state, visual_rest, blocks_staged, jnp.asarray(images),
                     jnp.asarray(mask), jnp.asarray(label),
                     jnp.asarray(class_idx), jnp.asarray(valid))

    step.pp = pp
    step.dp = dp
    step.n_micro = n_micro
    return step

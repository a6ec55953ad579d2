"""Pipeline parallelism for the eval trunk (GPipe-style, level-aligned).

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
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from aaclip_tpu.core.config import AdapterConfig, CLIPConfig, DtypePolicy
from aaclip_tpu.models import layers as L
from aaclip_tpu.models.vit import embed


def make_pp_mesh(pp: int, num_devices: Optional[int] = None) -> Mesh:
    """1-D ``('stage',)`` mesh over the first ``pp`` devices (ring order —
    the per-tick ``ppermute`` hop rides neighbouring ICI links)."""
    devices = jax.devices()
    n = num_devices or len(devices)
    if pp < 2 or pp > n:
        raise ValueError(f"pipeline_parallel={pp} needs 2..{n} devices")
    return Mesh(np.asarray(devices[:pp]), ("stage",))


def _validate(cfg: CLIPConfig, acfg: AdapterConfig, pp: int) -> int:
    """Check the level structure is pipelineable; returns taps per stage."""
    v = cfg.vision
    levels = tuple(acfg.levels)
    n_lev = len(levels)
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


def make_pipeline_predict_fn(clip_params: dict, cfg: CLIPConfig,
                             acfg: AdapterConfig, *, pp: int,
                             n_micro: Optional[int] = None,
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
    """
    from aaclip_tpu.core.params import cast_matmul_weights
    from aaclip_tpu.models.layers import config_act
    from aaclip_tpu.ops.similarity import image_score

    if policy.bf16_until:
        raise ValueError("pipeline parallelism does not support the "
                         "staged-precision (bf16_until) trunk")
    tps = _validate(cfg, acfg, pp)
    n_micro = n_micro or pp
    mesh = make_pp_mesh(pp)
    v = cfg.vision
    spacing = v.layers // len(acfg.levels)
    Ls = tps * spacing                       # layers per stage
    img = img_size or v.image_size
    grid = img // v.patch_size
    S = grid * grid + 1
    n_lev = len(acfg.levels)

    visual = cast_matmul_weights(clip_params["visual"], policy)
    _act = config_act(cfg, policy)
    _pp_prec = "highest" if policy.precision == "highest" else "high"
    # per-layer blend weights: adapted layers get the configured weight
    w_layers = jnp.where(jnp.arange(v.layers) < acfg.image_adapt_until,
                         jnp.float32(acfg.image_adapt_weight),
                         jnp.float32(0.0))

    def _stage_split(tree):
        """[L, ...] stacked leaves -> [pp, L/pp, ...] (leading stage axis)."""
        return jax.tree.map(
            lambda a: a.reshape((pp, Ls) + a.shape[1:]), tree)

    def _pad_adapters(layer_adapters):
        """[n_adapt, ...] trainable stack -> [pp, L/pp, ...] with finite
        dummies for unadapted layers (their blend weight is 0)."""
        def pad(a):
            n_adapt = a.shape[0]
            fill = jnp.ones((v.layers - n_adapt,) + a.shape[1:], a.dtype)
            return jnp.concatenate([a, fill]).reshape(
                (pp, Ls) + a.shape[1:])
        return jax.tree.map(pad, layer_adapters)

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

            def body(hh, per):
                b, ad, wl = per
                hh = L.residual_block(hh, b, v.heads, act=_act,
                                      policy=policy, attn_fn=attn_fn)
                a = L.simple_adapter(hh, ad, policy)
                x_norm = jnp.linalg.norm(hh, axis=-1, keepdims=True)
                a_norm = jnp.maximum(
                    jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
                blended = wl * (a * (x_norm / a_norm)) + (1.0 - wl) * hh
                hh = jnp.where(wl > 0, blended.astype(hh.dtype), hh)
                return hh, None

            h, _ = jax.lax.scan(body, h, (blk, ada, wseg))
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
        # selects per-stage work) — mark the init accordingly (shard_map's
        # varying-manual-axes typing)
        init = jax.tree.map(
            lambda a: jax.lax.pcast(a, "stage", to="varying"),
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
    sharded = jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=(stage_spec, stage_spec, stage_spec, stage_spec,
                  P(), P(), P(), P()),
        out_specs=(P(), P()))

    def _predict_impl(visual, image_adapter, images, anchors, M):
        B = images.shape[0]
        x = embed(visual, cfg, images, policy)           # [B, S, D]
        emb_mb = x.reshape(n_micro, B // n_micro, S, v.width)
        blocks_staged = _stage_split(visual["blocks"])
        adapters_staged = _pad_adapters(image_adapter["layer_adapters"])
        seg_w = jnp.stack([image_adapter["seg_proj"][i]["w"]
                           for i in range(n_lev)])       # [n_lev, D, E]
        seg_w = seg_w.reshape((pp, tps) + seg_w.shape[1:])
        anchors_mb = anchors
        if anchors.ndim == 3:
            anchors_mb = anchors.reshape((n_micro, B // n_micro)
                                         + anchors.shape[1:])
        q, det = sharded(blocks_staged, adapters_staged,
                         w_layers.reshape(pp, Ls), seg_w,
                         image_adapter["det_proj"]["w"], visual["ln_post"],
                         emb_mb, anchors_mb)
        q = q.reshape(B, grid, grid)
        det = det.reshape(B, -1)
        pix = jnp.einsum("Ig,bgh->bIh", M, q,
                         preferred_element_type=jnp.float32,
                         precision=_pp_prec)
        pix = jnp.einsum("Jh,bIh->bIJ", M, pix,
                         preferred_element_type=jnp.float32,
                         precision=_pp_prec)
        return pix, image_score(det, anchors)

    _predict = jax.jit(_predict_impl)

    def predict(image_adapter, images, anchors, M):
        B = images.shape[0]
        if B % n_micro:
            raise ValueError(
                f"batch {B} not divisible by n_micro={n_micro}")
        return _predict(visual, image_adapter, jnp.asarray(images),
                        jnp.asarray(anchors), jnp.asarray(M))

    predict.raw = _predict
    predict.visual = visual
    predict.mesh = None          # inputs are replicated; jit places them
    predict.pp = pp
    predict.n_micro = n_micro
    return predict

"""Tensor (model) parallelism for the ViT trunk.

Megatron-style sharding expressed the TPU-native way: parameters carry
GSPMD shardings over a 2-D ``('data', 'model')`` mesh and XLA inserts the
collectives.  Per block the layout is

* QKV projection column-parallel over attention HEADS (each device owns
  ``heads / tp`` complete heads, so scores/softmax/context need no
  communication),
* attention out-projection row-parallel (one ``psum`` over ``'model'``
  restores the residual stream),
* MLP up-projection column-parallel over the 4x hidden dim, down-projection
  row-parallel (one more ``psum``),

i.e. two all-reduces per block — the standard tensor-parallel transformer
schedule (reference AA-CLIP is strictly single-device; this subsystem is a
TPU-native extension, like ``parallel/sharding.py``'s data parallelism).

The one layout subtlety: the packed QKV weight stores output columns in
``(3, heads, head_dim)`` order (q block, then k, then v — the torch
``in_proj_weight`` convention the checkpoint converter preserves,
reference model/transformer.py:85).  Sharding that axis over ``'model'``
would split the *q/k/v* factor, not heads, and every reshape to
``[B, S, 3, H, hd]`` would reshard.  ``repack_qkv_head_major`` permutes the
columns to ``(heads, 3, head_dim)`` order once at placement time, so the
head axis is outermost and the ``'model'`` sharding propagates through
every reshape with zero communication.  ``make_tp_attn_fn`` builds the
matching attention closure (plugged in as the ``attn_fn`` override of
``models.vit``'s trunk; the math is identical to ``layers.attention``).

Correctness is equality-tested against the single-device path on the
8-device CPU mesh (tests/test_tensor_parallel.py) and exercised by the
driver dryrun; with one real chip, multi-chip TP *throughput* is not
measurable here (same status as data parallelism, docs/PERFORMANCE.md).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aaclip_tpu.core.config import CLIPConfig, DtypePolicy


def make_mesh_2d(tp: int, num_devices: Optional[int] = None) -> Mesh:
    """``(n // tp, tp)`` device mesh with axes ``('data', 'model')``.

    The model axis is innermost so tensor-parallel collectives ride the
    fastest ICI hops; data-parallel traffic (none at eval, gradient psums
    in training) crosses the outer axis.
    """
    devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    if not 1 <= num_devices <= len(devices):
        raise ValueError(
            f"num_devices={num_devices} outside 1..{len(devices)} "
            f"available devices")
    n = num_devices
    if tp < 1 or n % tp:
        raise ValueError(f"tensor_parallel={tp} must divide device count {n}")
    return Mesh(np.asarray(devices[:n]).reshape(n // tp, tp),
                ("data", "model"))


def is_tp_mesh(mesh) -> bool:
    return (mesh is not None and "model" in mesh.axis_names
            and mesh.shape["model"] > 1)


def repack_qkv_head_major(w_qkv: jax.Array, b_qkv: jax.Array,
                          heads: int) -> Tuple[jax.Array, jax.Array]:
    """Permute packed-QKV output columns from (3, H, hd) to (H, 3, hd) order.

    Accepts stacked block weights ``[L, D, 3D]`` / biases ``[L, 3D]`` (or
    unstacked ``[D, 3D]`` / ``[3D]``).  Pure permutation — consumed by
    ``make_tp_attn_fn``'s reshape; everything else about the math is
    unchanged.
    """
    stacked = w_qkv.ndim == 3
    if not stacked:
        w_qkv, b_qkv = w_qkv[None], b_qkv[None]
    L, D, threeD = w_qkv.shape
    hd = D // heads
    w = w_qkv.reshape(L, D, 3, heads, hd).transpose(0, 1, 3, 2, 4)
    w = w.reshape(L, D, threeD)
    b = b_qkv.reshape(L, 3, heads, hd).transpose(0, 2, 1, 3).reshape(L, threeD)
    if not stacked:
        w, b = w[0], b[0]
    return w, b


def _tower_partition_specs(tower: dict) -> dict:
    """PartitionSpec pytree for a (stacked-block) tower param tree.

    Embeddings / LayerNorms / output proj are tiny — replicated; the block
    matmuls carry the Megatron layout described in the module docstring.
    Leading axis of every block leaf is the stacked layer axis (unsharded —
    ``lax.scan`` consumes it).  Works for both the visual and the text
    tower: their block pytrees share the attn/mlp leaf schema.
    """
    specs = jax.tree.map(lambda _: P(), tower)
    tables = {
        "attn": {
            "w_qkv": P(None, None, "model"),  # [L,D,3D] col-parallel (heads)
            "b_qkv": P(None, "model"),
            "w_out": P(None, "model", None),  # [L, D, D] row-parallel
            "b_out": P(None, None),
        },
        "mlp": {
            "w_fc": P(None, None, "model"),   # [L, D, 4D] column-parallel
            "b_fc": P(None, "model"),
            "w_proj": P(None, "model", None),  # [L, 4D, D] row-parallel
            "b_proj": P(None, None),
        },
    }
    for part, table in tables.items():
        leaves = tower["blocks"][part]
        extra = set(leaves) - set(table)
        if extra:
            # fail with a named error instead of device_put's opaque
            # pytree-structure mismatch (e.g. ops/quant.py int8 trees
            # carry *_s scale leaves — quantization does not compose
            # with tensor parallelism)
            raise ValueError(
                f"tensor parallelism does not recognize blocks.{part} "
                f"leaves {sorted(extra)}; int8/quantized param trees do "
                "not compose with --tensor_parallel")
        specs["blocks"][part] = {k: table[k] for k in leaves}
    return specs


def visual_partition_specs(visual: dict) -> dict:
    """PartitionSpec pytree for the visual tower (see
    ``_tower_partition_specs``)."""
    return _tower_partition_specs(visual)


def shard_visual(visual: dict, cfg: CLIPConfig, mesh: Mesh):
    """Repack QKV head-major and place the visual tree on the TP mesh.

    Returns ``(params, shardings)`` — the sharding pytree doubles as the
    ``in_shardings`` entry when jitting a function that takes the tree.

    WARNING: the returned tree's ``w_qkv``/``b_qkv`` columns are in
    HEAD-MAJOR order, valid ONLY with the paired ``make_tp_attn_fn``
    closure. Any standard packed-layout consumer — ``layers.attention``,
    the V-V surgery slice ``w_qkv[:, 2*D:]``, the Pallas kernels — would
    silently compute garbage on it. Do not route this tree through
    ``encode_image``'s V-V path or any block without the TP attn_fn.
    """
    return _shard_tower(visual, cfg.vision.heads, mesh)


def shard_text(text: dict, cfg: CLIPConfig, mesh: Mesh):
    """Text-tower analogue of ``shard_visual`` (same Megatron layout, same
    head-major repack, same WARNING about the repacked QKV columns).  Used
    by the tensor-parallel stage-1 step, where the text tower carries the
    gradient path (reference train.py:38-114)."""
    return _shard_tower(text, cfg.text.heads, mesh)


def _shard_tower(tower: dict, heads: int, mesh: Mesh):
    tp = mesh.shape["model"]
    if heads % tp:
        raise ValueError(
            f"model-parallel size {tp} must divide head count {heads}")
    hidden = tower["blocks"]["mlp"]["w_fc"].shape[-1]
    if hidden % tp:
        raise ValueError(
            f"model-parallel size {tp} must divide MLP hidden dim {hidden}")
    tower = dict(tower)
    blocks = dict(tower["blocks"])
    attn = dict(blocks["attn"])
    attn["w_qkv"], attn["b_qkv"] = repack_qkv_head_major(
        attn["w_qkv"], attn["b_qkv"], heads)
    blocks["attn"] = attn
    tower["blocks"] = blocks
    specs = _tower_partition_specs(tower)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(tower, shardings), shardings


def make_sp_constraint(mesh: Mesh):
    """Sequence-parallel residual-stream constraint (Megatron-SP).

    Returns a function pinning a ``[B, S, D]`` activation to
    ``P('data', 'model', None)`` — the sequence axis sharded over the
    model-parallel devices.  Applied to each block's output
    (``run_block_range(resid_fn=...)``), GSPMD then turns the block's two
    all-reduces into reduce-scatter + all-gather pairs (same bytes on the
    wire, but every LayerNorm / residual add / adapter blend between them
    computes — and stores, under remat — only ``S / tp`` of the sequence
    per device).  Differentiable: the transpose of a sharding constraint
    is the same constraint, so the backward pass keeps the schedule.
    """
    s = NamedSharding(mesh, P("data", "model", None))

    def constrain(x: jax.Array) -> jax.Array:
        return jax.lax.with_sharding_constraint(x, s)

    return constrain


def make_batch_dp_constraint(mesh: Mesh):
    """Constraint pinning a ``[B, S, D]`` stream's BATCH axis to the data
    axis.  Used on the stage-1 text tower's prompt batch (C*S sentences —
    per-step constant work): without it GSPMD replicates the whole tower
    forward+backward on every data shard; with it the sentences split
    across data devices and the anchor reduction gathers [C*S, D] vectors
    (tiny).  Numerics-neutral — sharding a batch axis splits no
    reduction."""
    s = NamedSharding(mesh, P("data", None, None))

    def constrain(x: jax.Array) -> jax.Array:
        return jax.lax.with_sharding_constraint(x, s)

    return constrain


def make_tp_attn_fn(heads: int, mesh: Mesh, policy: DtypePolicy,
                    sequence_parallel: bool = False, causal: bool = False):
    """Attention closure for head-major-packed params under the TP mesh.

    Same math as ``layers.attention`` (fp32 accumulation, fp32 softmax)
    with the QKV reshape in head-major order and sharding constraints
    pinning each head's q/k/v — and therefore scores and context — to one
    ``'model'`` shard.  The out-projection contracts over the sharded
    feature axis; GSPMD emits the block's single attention all-reduce
    there — or, with ``sequence_parallel=True``, a reduce-scatter into a
    sequence-sharded output (pair with ``make_sp_constraint`` on the
    residual stream).

    ``causal=True`` applies the text tower's additive causal mask inside
    the closure (reference model/transformer.py:629-635) — attn_fn
    overrides are otherwise unmasked by contract (models.layers.
    residual_block), so the closure advertises it via the ``causal``
    attribute and text_model._trunk checks for it.
    """
    from aaclip_tpu.models.layers import causal_mask

    qkv_s = NamedSharding(mesh, P("data", None, "model", None, None))
    ctx_s = NamedSharding(mesh, P("data", "model", None, None))
    out_s = NamedSharding(
        mesh, P("data", "model", None) if sequence_parallel
        else P("data", None, None))

    def attn(x: jax.Array, p: dict) -> jax.Array:
        B, L, D = x.shape
        hd = D // heads
        scale = hd ** -0.5
        cd = policy.compute_dtype
        qkv = jnp.dot(x.astype(cd), p["w_qkv"].astype(cd),
                      preferred_element_type=jnp.float32,
                      precision=policy.precision)
        qkv = qkv + p["b_qkv"].astype(jnp.float32)
        # same save-name as the Pallas kernel: remat="selective" keeps the
        # QKV projection out of the backward recompute under TP training
        qkv = checkpoint_name(qkv, "attn_qkv")
        qkv = qkv.reshape(B, L, heads, 3, hd)
        qkv = jax.lax.with_sharding_constraint(qkv, qkv_s)
        q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)   # [B, H, L, hd]
        k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, :, 2].transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cd), k.astype(cd),
                            preferred_element_type=jnp.float32,
                            precision=policy.precision) * scale
        if causal:
            scores = scores + causal_mask(L)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(cd), v.astype(cd),
                         preferred_element_type=jnp.float32,
                         precision=policy.precision)
        ctx = jax.lax.with_sharding_constraint(ctx, ctx_s)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
        out = jnp.dot(ctx.astype(cd), p["w_out"].astype(cd),
                      preferred_element_type=jnp.float32,
                      precision=policy.precision)
        out = out + p["b_out"].astype(jnp.float32)
        out = jax.lax.with_sharding_constraint(out.astype(x.dtype), out_s)
        return out

    attn.causal = causal
    return attn


def make_tp_vv_attn_fn(heads: int, mesh: Mesh, policy: DtypePolicy,
                       batch_mode: bool = False, valid=None,
                       sequence_parallel: bool = False):
    """V-V (CLIP-Surgery) attention closure for head-major-packed params
    under the TP mesh — the stage-1 surgery tail's kernel.

    Only the V slice of the packed projection is needed; in head-major
    column order it is index 2 of the per-head (q,k,v) triplet, NOT the
    trailing third the standard-packing slice ``w_qkv[:, 2D:]`` takes
    (layers.attention vv=True / attention_vv_batch) — slicing head-major
    weights that way computes garbage, which is why shard_visual's repacked
    trees must route through this closure.

    ``batch_mode=True`` reproduces the reference's V-V layout quirk (the
    softmax runs across the BATCH at each position — attention_vv_batch,
    docs/PARITY.md); ``valid`` ([B] 0/1) masks pad rows out of that
    cross-batch softmax exactly like layers.make_batch_vv_attn_fn.  The
    default is the per-sample spatial form (layers.attention vv=True).
    Head-sharding over ``'model'`` is valid in both modes: every score /
    softmax / context reduction is per-head.
    """
    v_s = NamedSharding(mesh, P("data", None, "model", None))
    out_s = NamedSharding(
        mesh, P("data", "model", None) if sequence_parallel
        else P("data", None, None))

    def vv_attn(x: jax.Array, p: dict) -> jax.Array:
        B, L, D = x.shape
        hd = D // heads
        scale = hd ** -0.5
        cd = policy.compute_dtype
        w = p["w_qkv"].reshape(D, heads, 3, hd)[:, :, 2, :]  # head-major V
        b = p["b_qkv"].reshape(heads, 3, hd)[:, 2, :].reshape(-1)
        v = jnp.dot(x.astype(cd), w.reshape(D, D).astype(cd),
                    preferred_element_type=jnp.float32,
                    precision=policy.precision)
        v = v + b.astype(jnp.float32)
        v = v.reshape(B, L, heads, hd)
        v = jax.lax.with_sharding_constraint(v, v_s)
        if batch_mode:
            scores = jnp.einsum("alhd,blhd->lhab", v.astype(cd),
                                v.astype(cd),
                                preferred_element_type=jnp.float32,
                                precision=policy.precision) * scale
            if valid is not None:
                scores = jnp.where(valid.astype(bool)[None, None, None, :],
                                   scores, jnp.float32(-1e30))
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            ctx = jnp.einsum("lhab,blhd->alhd", probs.astype(cd),
                             v.astype(cd),
                             preferred_element_type=jnp.float32,
                             precision=policy.precision)
        else:
            vh = v.transpose(0, 2, 1, 3)  # [B, H, L, hd]
            scores = jnp.einsum("bhqd,bhkd->bhqk", vh.astype(cd),
                                vh.astype(cd),
                                preferred_element_type=jnp.float32,
                                precision=policy.precision) * scale
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(cd),
                             vh.astype(cd),
                             preferred_element_type=jnp.float32,
                             precision=policy.precision)
            ctx = ctx.transpose(0, 2, 1, 3)  # -> [B, L, H, hd]
        out = jnp.dot(ctx.reshape(B, L, D).astype(cd),
                      p["w_out"].astype(cd),
                      preferred_element_type=jnp.float32,
                      precision=policy.precision)
        out = out + p["b_out"].astype(jnp.float32)
        return jax.lax.with_sharding_constraint(out.astype(x.dtype), out_s)

    return vv_attn

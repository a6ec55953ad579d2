"""Text transformer tower as pure functions.

Two forward variants (reference model/model.py:190-201 for the frozen path,
model/adapter.py:114-145 for the adapted path):

* ``encode_text`` — frozen CLIP: token embed + pos embed -> 12 causal blocks
  -> ln_final -> EOT pooling -> @ text_projection.
* ``adapted_encode_text`` — same, but blocks 0..text_adapt_until-1 are
  blended with norm-matched SimpleAdapters and the final projection is the
  trainable SimpleProj (768->768, LeakyReLU) *instead of* CLIP's
  text_projection.

Blocks are stacked along a leading layer axis and run with lax.scan (two
segments in the adapted path: with-adapters then plain) for fast compiles.
EOT pooling uses argmax over token ids (the EOT id 49407 is the largest in
any sequence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aaclip_tpu.core.config import CLIPConfig, DtypePolicy
from aaclip_tpu.models import layers as L
from aaclip_tpu.models.vit import run_block_range, slice_blocks


def _trunk(params: dict, cfg: CLIPConfig, text: jax.Array, *,
           adapters=None, adapt_weight: float = 0.1,
           policy: DtypePolicy = DtypePolicy(), act=None,
           remat: bool = False, attn_fn=None, resid_fn=None) -> jax.Array:
    """Shared embed + causal transformer + per-layer adapter blends.

    ``attn_fn`` optionally overrides the attention implementation; because
    this tower is causal and attn_fn overrides are unmasked by contract
    (layers.residual_block), the override must apply the causal mask itself
    and advertise it via a truthy ``causal`` attribute
    (parallel/tensor.make_tp_attn_fn(causal=True) does).  ``resid_fn`` is
    the per-block residual-stream constraint hook (sequence/data sharding
    under a mesh — vit.run_block_range).
    """
    if act is None:
        act = L.config_act(cfg, policy)
    t = cfg.text
    x = params["token_embedding"][text]  # [B, ctx, width]
    x = x.astype(policy.compute_dtype)
    # follow the INPUT length, not cfg.text.context_length: identical for
    # the tokenizer's padded-77 batches, and callers that trim padding to
    # save FLOPs get a correct causal prefix instead of a broadcast crash
    Lt = text.shape[1]
    x = x + params["positional_embedding"][:Lt].astype(x.dtype)[None]
    if attn_fn is not None:
        if not getattr(attn_fn, "causal", False):
            raise ValueError(
                "text-tower attn_fn overrides must apply the causal mask "
                "internally and set fn.causal=True "
                "(parallel/tensor.make_tp_attn_fn(causal=True)); an "
                "unmasked override would silently compute non-causal "
                "attention")
        mask = None  # the override masks internally
    else:
        mask = L.causal_mask(Lt)
    n_adapt = 0
    if adapters is not None:
        n_adapt = jax.tree.leaves(adapters)[0].shape[0]
    if n_adapt > t.layers:
        # mirrors vit._trunk_with_taps: silently slicing would apply only
        # the first t.layers adapters and train the rest as dead weight
        raise ValueError(
            f"{n_adapt} text adapters exceed the {t.layers}-layer tower; "
            f"set text_adapt_until to match the model config")
    if n_adapt:
        x = run_block_range(
            x, slice_blocks(params["blocks"], 0, n_adapt), t.heads,
            mask=mask, adapters=adapters, adapt_weight=adapt_weight,
            act=act, policy=policy, remat=remat, attn_fn=attn_fn,
            resid_fn=resid_fn)
    x = run_block_range(
        x, slice_blocks(params["blocks"], n_adapt, t.layers), t.heads,
        mask=mask, act=act, policy=policy, remat=remat, attn_fn=attn_fn,
        resid_fn=resid_fn)
    return L.layer_norm(x, params["ln_final"])


def _eot_pool(x: jax.Array, text: jax.Array) -> jax.Array:
    eot = jnp.argmax(text, axis=-1)
    return jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]


def encode_text(params: dict, cfg: CLIPConfig, text: jax.Array, *,
                policy: DtypePolicy = DtypePolicy(), act=None) -> jax.Array:
    """Frozen CLIP text encoding -> [B, embed_dim]."""
    x = _trunk(params, cfg, text, policy=policy, act=act)
    pooled = _eot_pool(x, text)
    cd = policy.compute_dtype
    return jnp.dot(pooled.astype(cd), params["text_projection"].astype(cd),
                   preferred_element_type=jnp.float32,
                   precision=policy.precision).astype(x.dtype)


def adapted_encode_text(params: dict, text_adapter: dict, cfg: CLIPConfig,
                        text: jax.Array, *, text_adapt_weight: float = 0.1,
                        policy: DtypePolicy = DtypePolicy(), act=None,
                        remat: bool = False, attn_fn=None,
                        resid_fn=None) -> jax.Array:
    """AdaptedCLIP text encoding: trainable blends + trainable final proj
    (reference model/adapter.py:114-145).  The SimpleProj always applies
    LeakyReLU (model/adapter.py:43)."""
    x = _trunk(params, cfg, text,
               adapters=text_adapter["layer_adapters"],
               adapt_weight=text_adapt_weight, policy=policy, act=act,
               remat=remat, attn_fn=attn_fn, resid_fn=resid_fn)
    pooled = _eot_pool(x, text)
    return L.simple_proj(pooled, text_adapter["proj"], relu=True, policy=policy)

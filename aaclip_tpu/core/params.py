"""Parameter pytree construction: random init, OpenAI checkpoint conversion,
and positional-embedding resizing.

The frozen CLIP weights and the trainable adapters live in *separate*
pytrees, so ``jax.grad`` differentiates only the adapter subtree and XLA can
treat the frozen weights as constants.

Checkpoint conversion (torch -> pytree) happens once on the host; the
runtime itself has no torch dependency.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from aaclip_tpu.core.config import AdapterConfig, CLIPConfig, DtypePolicy

# --------------------------------------------------------------------------
# Random initialization (used for tests and when no checkpoint is present).


def _ln_init(width: int, dtype) -> dict:
    return {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)}


def _block_init(key, width: int, mlp_width: int, dtype) -> dict:
    k = jax.random.split(key, 4)
    attn_std = width ** -0.5
    proj_std = attn_std * 0.5
    fc_std = (2 * width) ** -0.5
    return {
        "ln_1": _ln_init(width, dtype),
        "attn": {
            "w_qkv": (jax.random.normal(k[0], (width, 3 * width)) * attn_std).astype(dtype),
            "b_qkv": jnp.zeros((3 * width,), dtype),
            "w_out": (jax.random.normal(k[1], (width, width)) * proj_std).astype(dtype),
            "b_out": jnp.zeros((width,), dtype),
        },
        "ln_2": _ln_init(width, dtype),
        "mlp": {
            "w_fc": (jax.random.normal(k[2], (width, mlp_width)) * fc_std).astype(dtype),
            "b_fc": jnp.zeros((mlp_width,), dtype),
            "w_proj": (jax.random.normal(k[3], (mlp_width, width)) * proj_std).astype(dtype),
            "b_proj": jnp.zeros((width,), dtype),
        },
    }


def init_clip_params(key: jax.Array, cfg: CLIPConfig,
                     policy: DtypePolicy = DtypePolicy()) -> dict:
    """Random CLIP parameter pytree with the run-time image size."""
    v, t = cfg.vision, cfg.text
    dtype = policy.param_dtype
    kv, kt = jax.random.split(key)
    vks = jax.random.split(kv, v.layers + 4)
    tks = jax.random.split(kt, t.layers + 4)
    scale_v = v.width ** -0.5
    scale_t = t.width ** -0.5
    patch_dim = 3 * v.patch_size * v.patch_size
    visual = {
        "conv1": {"w": (jax.random.normal(vks[0], (patch_dim, v.width))
                        * patch_dim ** -0.5).astype(dtype)},
        "class_embedding": (jax.random.normal(vks[1], (v.width,)) * scale_v).astype(dtype),
        "positional_embedding": (jax.random.normal(vks[2], (v.seq_len, v.width))
                                 * scale_v).astype(dtype),
        "ln_pre": _ln_init(v.width, dtype),
        "blocks": [
            _block_init(vks[3 + i], v.width, int(v.width * v.mlp_ratio), dtype)
            for i in range(v.layers)
        ],
        "ln_post": _ln_init(v.width, dtype),
        "proj": (jax.random.normal(vks[-1], (v.width, v.output_dim)) * scale_v).astype(dtype),
    }
    text = {
        "token_embedding": (jax.random.normal(tks[0], (t.vocab_size, t.width)) * 0.02).astype(dtype),
        "positional_embedding": (jax.random.normal(tks[1], (t.context_length, t.width))
                                 * 0.01).astype(dtype),
        "blocks": [
            _block_init(tks[2 + i], t.width, int(t.width * t.mlp_ratio), dtype)
            for i in range(t.layers)
        ],
        "ln_final": _ln_init(t.width, dtype),
        "text_projection": (jax.random.normal(tks[-1], (t.width, t.output_dim))
                            * scale_t).astype(dtype),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), dtype),
    }


def _xavier_uniform(key, shape, dtype):
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_adapter_params(key: jax.Array, cfg: CLIPConfig, acfg: AdapterConfig,
                        policy: DtypePolicy = DtypePolicy()) -> dict:
    """Trainable adapter pytree with Xavier-uniform weights (reference
    model/adapter.py:47-53).  All adapter linears are bias-free."""
    vw = cfg.vision.width
    tw = cfg.text.width
    ed = cfg.embed_dim
    dtype = policy.param_dtype
    n_img = acfg.image_adapt_until
    n_txt = acfg.text_adapt_until
    n_lvl = len(acfg.levels)
    keys = jax.random.split(key, n_img + n_lvl + 1 + n_txt + 1)
    ki = iter(keys)
    image = {
        "layer_adapters": [{"w": _xavier_uniform(next(ki), (vw, vw), dtype)}
                           for _ in range(n_img)],
        "seg_proj": [{"w": _xavier_uniform(next(ki), (vw, ed), dtype)}
                     for _ in range(n_lvl)],
        "det_proj": {"w": _xavier_uniform(next(ki), (vw, ed), dtype)},
    }
    text = {
        "layer_adapters": [{"w": _xavier_uniform(next(ki), (tw, tw), dtype)}
                           for _ in range(n_txt)],
        "proj": {"w": _xavier_uniform(next(ki), (tw, tw), dtype)},
    }
    return {"image": image, "text": text}


# --------------------------------------------------------------------------
# Positional-embedding resize (reference model/model.py:395-426: bicubic,
# antialias, align_corners=False — a no-op for upsampling scales).


def resize_pos_embed(pos: np.ndarray, new_grid: int) -> np.ndarray:
    """Resize a [1 + g*g, width] positional embedding to [1 + G*G, width]
    with bicubic interpolation (half-pixel centers)."""
    tok, img = pos[:1], pos[1:]
    old_grid = int(round(math.sqrt(img.shape[0])))
    if old_grid * old_grid != img.shape[0]:
        raise ValueError(f"non-square pos embed: {img.shape}")
    if old_grid == new_grid:
        return pos
    from aaclip_tpu.ops.resize import resize_bicubic_2d

    grid = np.asarray(img, np.float32).reshape(old_grid, old_grid, -1)
    grid = np.moveaxis(grid, -1, 0)  # [C, g, g]
    resized = resize_bicubic_2d(grid, (new_grid, new_grid))
    resized = np.moveaxis(resized, 0, -1).reshape(new_grid * new_grid, -1)
    return np.concatenate([np.asarray(tok, np.float32), resized], axis=0)


# --------------------------------------------------------------------------
# OpenAI .pt checkpoint -> pytree converter (host-side, uses torch).


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(x.detach().cpu().float().numpy())


def _convert_block(sd: dict, prefix: str) -> dict:
    return {
        "ln_1": {"scale": _t(sd[f"{prefix}.ln_1.weight"]),
                 "bias": _t(sd[f"{prefix}.ln_1.bias"])},
        "attn": {
            "w_qkv": _t(sd[f"{prefix}.attn.in_proj_weight"]).T,
            "b_qkv": _t(sd[f"{prefix}.attn.in_proj_bias"]),
            "w_out": _t(sd[f"{prefix}.attn.out_proj.weight"]).T,
            "b_out": _t(sd[f"{prefix}.attn.out_proj.bias"]),
        },
        "ln_2": {"scale": _t(sd[f"{prefix}.ln_2.weight"]),
                 "bias": _t(sd[f"{prefix}.ln_2.bias"])},
        "mlp": {
            "w_fc": _t(sd[f"{prefix}.mlp.c_fc.weight"]).T,
            "b_fc": _t(sd[f"{prefix}.mlp.c_fc.bias"]),
            "w_proj": _t(sd[f"{prefix}.mlp.c_proj.weight"]).T,
            "b_proj": _t(sd[f"{prefix}.mlp.c_proj.bias"]),
        },
    }


def convert_openai_state_dict(sd: dict, cfg: CLIPConfig) -> dict:
    """Convert an OpenAI/OpenCLIP torch state dict to the aaclip_tpu pytree,
    resizing the visual positional embedding to the run-time grid."""
    v, t = cfg.vision, cfg.text
    conv_w = _t(sd["visual.conv1.weight"])  # [width, 3, p, p]
    conv_w = conv_w.reshape(v.width, -1).T  # [(c,ky,kx), width]
    pos = resize_pos_embed(_t(sd["visual.positional_embedding"]), v.grid)
    visual = {
        "conv1": {"w": conv_w},
        "class_embedding": _t(sd["visual.class_embedding"]),
        "positional_embedding": pos,
        "ln_pre": {"scale": _t(sd["visual.ln_pre.weight"]),
                   "bias": _t(sd["visual.ln_pre.bias"])},
        "blocks": [
            _convert_block(sd, f"visual.transformer.resblocks.{i}")
            for i in range(v.layers)
        ],
        "ln_post": {"scale": _t(sd["visual.ln_post.weight"]),
                    "bias": _t(sd["visual.ln_post.bias"])},
        "proj": _t(sd["visual.proj"]),
    }
    text = {
        "token_embedding": _t(sd["token_embedding.weight"]),
        "positional_embedding": _t(sd["positional_embedding"]),
        "blocks": [
            _convert_block(sd, f"transformer.resblocks.{i}")
            for i in range(t.layers)
        ],
        "ln_final": {"scale": _t(sd["ln_final.weight"]),
                     "bias": _t(sd["ln_final.bias"])},
        "text_projection": _t(sd["text_projection"]),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": _t(sd["logit_scale"]).reshape(()),
    }


def load_openai_checkpoint(path: str, cfg: CLIPConfig) -> dict:
    """Load an OpenAI ViT checkpoint (.pt TorchScript archive or raw state
    dict, reference model/openai.py:17-136) and convert it."""
    import torch  # host-side only

    try:
        jit_model = torch.jit.load(path, map_location="cpu").eval()
        sd = jit_model.state_dict()
    except RuntimeError:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj.state_dict()
    sd = {k: v for k, v in sd.items() if isinstance(v, torch.Tensor)}
    return convert_openai_state_dict(sd, cfg)


DEFAULT_CKPT_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "weights", "ViT-L-14-336px.pt"),
    "/root/reference/model/ViT-L-14-336px.pt",
)


def find_default_checkpoint() -> Optional[str]:
    for p in DEFAULT_CKPT_PATHS:
        p = os.path.abspath(p)
        if os.path.isfile(p):
            return p
    env = os.environ.get("AACLIP_CKPT")
    if env and os.path.isfile(env):
        return env
    return None


def create_clip_params(cfg: CLIPConfig, *, checkpoint: Optional[str] = None,
                       seed: int = 0, require_pretrained: bool = False,
                       policy: DtypePolicy = DtypePolicy()) -> dict:
    """Build the frozen CLIP pytree: from a checkpoint when available,
    otherwise randomly initialized (tests / benchmarking without weights)."""
    path = checkpoint or find_default_checkpoint()
    if path is not None:
        return jax.tree.map(jnp.asarray, load_openai_checkpoint(path, cfg))
    if require_pretrained:
        raise FileNotFoundError(
            "Pretrained weights required but no checkpoint found; set "
            "AACLIP_CKPT or place ViT-L-14-336px.pt under aaclip_tpu/weights/."
        )
    return init_clip_params(jax.random.PRNGKey(seed), cfg, policy)


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

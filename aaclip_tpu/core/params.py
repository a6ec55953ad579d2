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

def stack_blocks(blocks: list) -> dict:
    """Stack a list of per-layer block pytrees along a new leading layer
    axis (the lax.scan-ready layout used by models/vit.py)."""
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *blocks)


def _rng_from(key) -> np.random.Generator:
    """numpy Generator from an int seed or a jax PRNGKey-like array.

    Random init runs HOST-SIDE in numpy: building ~430M params with
    per-block device ops is pathologically slow over remote TPU links.
    """
    if isinstance(key, (int, np.integer)):
        return np.random.default_rng(key)
    data = np.asarray(key).reshape(-1).astype(np.uint32)
    return np.random.default_rng(np.random.SeedSequence(data.tolist()))


# --------------------------------------------------------------------------
# Random initialization (used for tests and when no checkpoint is present).


def init_clip_params(key, cfg: CLIPConfig,
                     policy: DtypePolicy = DtypePolicy()) -> dict:
    """Random CLIP parameter pytree with the run-time image size.

    Generated ON DEVICE with one vectorized jax.random call per stacked
    leaf: host-side init + transfer of ~1.7GB is minutes over remote TPU
    links, while device-side generation is near-instant.
    """
    if isinstance(key, (int, np.integer)):
        key = jax.random.PRNGKey(int(key))
    v, t = cfg.vision, cfg.text
    dtype = policy.param_dtype
    keys = iter(jax.random.split(key, 24))

    def blocks_init(n_layers, width, mlp_width):
        attn_std = width ** -0.5
        proj_std = attn_std * 0.5
        fc_std = (2 * width) ** -0.5

        def n(shape, std):
            return (jax.random.normal(next(keys), shape) * std).astype(dtype)

        return {
            "ln_1": {"scale": jnp.ones((n_layers, width), dtype),
                     "bias": jnp.zeros((n_layers, width), dtype)},
            "attn": {
                "w_qkv": n((n_layers, width, 3 * width), attn_std),
                "b_qkv": jnp.zeros((n_layers, 3 * width), dtype),
                "w_out": n((n_layers, width, width), proj_std),
                "b_out": jnp.zeros((n_layers, width), dtype),
            },
            "ln_2": {"scale": jnp.ones((n_layers, width), dtype),
                     "bias": jnp.zeros((n_layers, width), dtype)},
            "mlp": {
                "w_fc": n((n_layers, width, mlp_width), fc_std),
                "b_fc": jnp.zeros((n_layers, mlp_width), dtype),
                "w_proj": n((n_layers, mlp_width, width), proj_std),
                "b_proj": jnp.zeros((n_layers, width), dtype),
            },
        }

    def ln(width):
        return {"scale": jnp.ones((width,), dtype),
                "bias": jnp.zeros((width,), dtype)}

    def n(shape, std):
        return (jax.random.normal(next(keys), shape) * std).astype(dtype)

    scale_v = v.width ** -0.5
    scale_t = t.width ** -0.5
    patch_dim = 3 * v.patch_size * v.patch_size
    visual = {
        "conv1": {"w": n((patch_dim, v.width), patch_dim ** -0.5)},
        "class_embedding": n((v.width,), scale_v),
        "positional_embedding": n((v.seq_len, v.width), scale_v),
        "ln_pre": ln(v.width),
        "blocks": blocks_init(v.layers, v.width, int(v.width * v.mlp_ratio)),
        "ln_post": ln(v.width),
        "proj": n((v.width, v.output_dim), scale_v),
    }
    text = {
        "token_embedding": n((t.vocab_size, t.width), 0.02),
        "positional_embedding": n((t.context_length, t.width), 0.01),
        "blocks": blocks_init(t.layers, t.width, int(t.width * t.mlp_ratio)),
        "ln_final": ln(t.width),
        "text_projection": n((t.width, t.output_dim), scale_t),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), dtype),
    }


def _xavier_uniform(rng: np.random.Generator, shape, dtype):
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return rng.uniform(-bound, bound, shape).astype(dtype)


def init_adapter_params(key: jax.Array, cfg: CLIPConfig, acfg: AdapterConfig,
                        policy: DtypePolicy = DtypePolicy()) -> dict:
    """Trainable adapter pytree with Xavier-uniform weights (reference
    model/adapter.py:47-53).  All adapter linears are bias-free."""
    vw = cfg.vision.width
    tw = cfg.text.width
    ed = cfg.embed_dim
    dtype = np.dtype(policy.param_dtype) if policy.param_dtype != jnp.bfloat16 \
        else np.float32
    n_img = acfg.image_adapt_until
    n_txt = acfg.text_adapt_until
    n_lvl = len(acfg.levels)
    rng = _rng_from(key)
    image = {
        "layer_adapters": {"w": np.stack([
            _xavier_uniform(rng, (vw, vw), dtype) for _ in range(n_img)])},
        "seg_proj": [{"w": _xavier_uniform(rng, (vw, ed), dtype)}
                     for _ in range(n_lvl)],
        "det_proj": {"w": _xavier_uniform(rng, (vw, ed), dtype)},
    }
    text = {
        "layer_adapters": {"w": np.stack([
            _xavier_uniform(rng, (tw, tw), dtype) for _ in range(n_txt)])},
        "proj": {"w": _xavier_uniform(rng, (tw, tw), dtype)},
    }
    return jax.tree.map(jnp.asarray, {"image": image, "text": text})


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
        "blocks": stack_blocks([
            _convert_block(sd, f"visual.transformer.resblocks.{i}")
            for i in range(v.layers)
        ]),
        "ln_post": {"scale": _t(sd["visual.ln_post.weight"]),
                    "bias": _t(sd["visual.ln_post.bias"])},
        "proj": _t(sd["visual.proj"]),
    }
    text = {
        "token_embedding": _t(sd["token_embedding.weight"]),
        "positional_embedding": _t(sd["positional_embedding"]),
        "blocks": stack_blocks([
            _convert_block(sd, f"transformer.resblocks.{i}")
            for i in range(t.layers)
        ]),
        "ln_final": {"scale": _t(sd["ln_final.weight"]),
                     "bias": _t(sd["ln_final.bias"])},
        "text_projection": _t(sd["text_projection"]),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": _t(sd["logit_scale"]).reshape(()),
    }


def _load_state_dict(path: str) -> dict:
    """Read a .pt TorchScript archive or raw state dict into a tensor-only
    dict (reference model/openai.py:17-136)."""
    import torch  # host-side only

    try:
        jit_model = torch.jit.load(path, map_location="cpu").eval()
        sd = jit_model.state_dict()
    except RuntimeError:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj.state_dict()
    return {k: v for k, v in sd.items() if isinstance(v, torch.Tensor)}


def load_openai_checkpoint(path: str, cfg: CLIPConfig) -> dict:
    """Load an OpenAI ViT checkpoint (.pt TorchScript archive or raw state
    dict, reference model/openai.py:17-136) and convert it."""
    sd = _load_state_dict(path)
    if not checkpoint_matches_config(sd, cfg):
        # the conv reshape can succeed numerically on mismatched widths,
        # silently producing garbage weights — fail with the reason
        raise ValueError(
            f"checkpoint {path!r} does not match the requested config "
            f"(vision width {cfg.vision.width}, {cfg.vision.layers} "
            f"layers, text width {cfg.text.width})")
    return convert_openai_state_dict(sd, cfg)


DEFAULT_CKPT_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "weights", "ViT-L-14-336px.pt"),
    "/root/reference/model/ViT-L-14-336px.pt",
)

# (path, mtime, arch dims) -> bool; see create_clip_params
_MATCH_CACHE: dict = {}


def find_default_checkpoint() -> Optional[str]:
    # the env var is an explicit user OVERRIDE: it must win over any
    # bundled default, or exporting AACLIP_CKPT would be silently ignored
    # whenever a checkpoint exists under aaclip_tpu/weights/
    env = os.environ.get("AACLIP_CKPT")
    if env and os.path.isfile(env):
        return env
    for p in DEFAULT_CKPT_PATHS:
        p = os.path.abspath(p)
        if os.path.isfile(p):
            return p
    return None


def checkpoint_matches_config(sd: dict, cfg: CLIPConfig) -> bool:
    """Cheap architecture compatibility check between a torch state dict
    and a config (vision width/depth, text width) — used to decide
    whether an implicitly DISCOVERED checkpoint applies to this config."""
    try:
        v, t = cfg.vision, cfg.text
        return (sd["visual.conv1.weight"].shape[0] == v.width
                and f"visual.transformer.resblocks.{v.layers - 1}"
                    ".ln_1.weight" in sd
                and f"visual.transformer.resblocks.{v.layers}"
                    ".ln_1.weight" not in sd
                and sd["token_embedding.weight"].shape[1] == t.width)
    except (KeyError, AttributeError, IndexError):
        return False


def resolve_clip_checkpoint(cfg: CLIPConfig, checkpoint: Optional[str] = None,
                            require_pretrained: bool = False
                            ) -> Optional[str]:
    """The checkpoint path :func:`create_clip_params` will actually load,
    or None for random init.

    An explicit ``checkpoint`` (or ``require_pretrained``) is returned
    as-is; an implicitly discovered default (AACLIP_CKPT / bundled paths)
    only when its architecture matches ``cfg``.  Callers that key derived
    state on the params' provenance (e.g. the serving anchor cache) MUST
    use this, not the raw argument — the raw argument being None does not
    mean random init on a rig that carries discoverable weights."""
    path = checkpoint or find_default_checkpoint()
    if path is not None and checkpoint is None and not require_pretrained:
        # cache the match DECISION per (path, mtime, arch): probing needs
        # a full torch.load, and on a rig that carries the real weights
        # every tiny-config construction (tests, dryrun) would otherwise
        # re-deserialize ~1.7 GB just to learn "mismatch, random init"
        key = (path, os.path.getmtime(path), cfg.vision.width,
               cfg.vision.layers, cfg.text.width)
        matches = _MATCH_CACHE.get(key)
        if matches is None:
            matches = checkpoint_matches_config(_load_state_dict(path), cfg)
            _MATCH_CACHE[key] = matches
        if not matches:
            import logging
            logging.getLogger("aaclip").info(
                "default checkpoint %s does not match config (width %d, "
                "%d layers) — using random init", path, cfg.vision.width,
                cfg.vision.layers)
            path = None
    return path


def create_clip_params(cfg: CLIPConfig, *, checkpoint: Optional[str] = None,
                       seed: int = 0, require_pretrained: bool = False,
                       policy: DtypePolicy = DtypePolicy()) -> dict:
    """Build the frozen CLIP pytree: from a checkpoint when available,
    otherwise randomly initialized (tests / benchmarking without weights).

    An EXPLICIT ``checkpoint`` (or ``require_pretrained``) must load or
    fail.  An implicitly discovered default (AACLIP_CKPT / bundled paths)
    is used only when its architecture matches ``cfg`` — otherwise e.g.
    every tiny-test construction (tests, the multichip dryrun) would
    crash on a rig that happens to carry the real ViT-L weights."""
    path = resolve_clip_checkpoint(cfg, checkpoint, require_pretrained)
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


def cast_matmul_weights(tree, policy: DtypePolicy):
    """Pre-cast >=2-D weight leaves to the policy's compute dtype so the
    per-step ``w.astype(bf16)`` inside jit becomes a no-op (saves casting
    ~1.7GB of frozen weights every call).  1-D leaves (LayerNorm scales,
    biases) stay in the storage dtype for fp32 math."""
    cd = policy.compute_dtype
    if cd == policy.param_dtype:
        return tree

    def cast(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(cd)
        return x

    return jax.tree.map(cast, tree)

"""Model architecture configuration.

The single production architecture is OpenAI CLIP ViT-L/14-336 evaluated at
img_size 518 (reference: model/model_configs/ViT-L-14-336.json:1-16 and the
image-size override at model/clip.py:112).  A tiny config is provided for
tests and the multi-chip dry run.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 518          # run-time resolution (pos embed resized)
    native_image_size: int = 336   # checkpoint's native resolution
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    output_dim: int = 768

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 768
    heads: int = 12
    layers: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 768

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """Full two-tower config.

    ``quick_gelu`` is False: the reference's final model is built via
    ``CLIP(**model_cfg)`` with the default ``quick_gelu=False`` (exact-erf
    GELU), even though the weights are OpenAI's (model/clip.py:127,
    model/model.py:84).
    """

    vision: VisionConfig = dataclasses.field(default_factory=VisionConfig)
    text: TextConfig = dataclasses.field(default_factory=TextConfig)
    embed_dim: int = 768
    quick_gelu: bool = False

    def with_image_size(self, image_size: int) -> "CLIPConfig":
        if image_size % self.vision.patch_size:
            # patchify reshapes H into (grid, patch); a non-multiple would
            # die in an opaque reshape deep inside the jitted trace
            raise ValueError(
                f"img_size {image_size} is not a multiple of the "
                f"{self.vision.patch_size}px patch size")
        return dataclasses.replace(
            self, vision=dataclasses.replace(self.vision, image_size=image_size)
        )


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    """Trainable adapter hyper-parameters (reference: model/adapter.py:6-45,
    flags at train.py:211-215).

    ``proj_relu`` corresponds to the ``--relu`` CLI flag (default False: the
    golden run uses plain bias-free Linear seg/det projections, while the
    text adapter's final projection always uses LeakyReLU).
    """

    text_adapt_weight: float = 0.1
    image_adapt_weight: float = 0.1
    text_adapt_until: int = 3
    image_adapt_until: int = 6
    levels: Tuple[int, ...] = (6, 12, 18, 24)
    proj_relu: bool = False


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    """Precision policy.

    ``param_dtype`` is what parameters are stored in; ``compute_dtype`` is
    what matmul inputs are cast to; ``precision`` is the XLA dot precision
    (on TPU, fp32 inputs with default precision run as bf16 passes — parity
    paths need ``'highest'``).  LayerNorm statistics, softmax, and the
    residual stream always run in float32 for numerical safety.
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    precision: str | None = "highest"
    fast_act: bool = False  # tanh-approx GELU (saves ~20% of trunk VPU time)
    # Staged-precision vision trunk (INFERENCE path only — training steps
    # neutralize it to keep the uniform training numerics): the first
    # ``bf16_until`` vision blocks run single-pass bf16 matmuls while the
    # residual stream, LayerNorm statistics, and every later block keep the
    # policy's fp32 semantics.  Adopted for fp32_high after the round-3
    # on-chip task-level equality run (docs/PERFORMANCE.md).
    bf16_until: int = 0
    # int8 quantized inference (ops/quant.py): trunk QKV/out/MLP weights
    # stored as per-channel int8, activations dynamically quantized per
    # token, matmuls on the int8 MXU path (2x bf16 peak). INFERENCE ONLY —
    # training CLIs reject it; the opt-in quality trade is measured like
    # the bf16 fast path's (tests/test_fast_path_quality.py).
    quant_int8: bool = False
    # Mixed-prefix quantization (round 5, the int8-rescue experiment):
    # with quant_int8, ``int8_until=K`` quantizes only blocks [0, K) and
    # keeps the rest in the policy compute dtype — the round-4 demotion
    # traced the --hard gate failure to IMAGE metrics (the det token taps
    # the last block), so sparing the late blocks targets exactly that
    # sensitivity. 0 = quantize the whole trunk (the original int8 path).
    int8_until: int = 0

    def prefix_policy(self) -> "DtypePolicy":
        """Policy for the bf16-staged leading trunk blocks: single-pass
        bf16 matmul inputs, same activation function, staging cleared."""
        return dataclasses.replace(self, compute_dtype=jnp.bfloat16,
                                   precision=None, bf16_until=0)

    def unstaged(self) -> "DtypePolicy":
        """This policy with trunk staging disabled (training steps and
        parity checks use this)."""
        if not self.bf16_until:
            return self
        return dataclasses.replace(self, bf16_until=0)

    @classmethod
    def fp32(cls) -> "DtypePolicy":
        """Exact-parity path: fp32 matmuls at full TPU precision (6-pass
        bf16 decomposition, ~fp32-exact), erf GELU."""
        return cls(jnp.float32, jnp.float32, "highest", False)

    @classmethod
    def fp32_high(cls) -> "DtypePolicy":
        """Fast-parity path: fp32 storage/residual stream and erf GELU, with
        3-pass (F32_AS_3BF16) matmuls and — since round 3 — the first 6
        vision blocks (exactly the adapter-blend range) staged at
        single-pass bf16 matmuls on the INFERENCE path (training steps
        neutralize staging via ``unstaged()``).

        Measured on the v5e chip (docs/PERFORMANCE.md, round-3 staged
        section): 42.3 maps/s (vs 36.4 unstaged, 20.2 fp32), pixel-map
        deviation ~1.9e-3 of the map's span vs the 6-pass parity path, and
        the on-chip task-level run reproduces the fp32 metric table exactly
        to every digit (pixel/image AUROC+AP and AUPRO per class).
        ``bf16_until=12`` measures 49.6 maps/s at ~2.2e-3 span deviation
        with the same exact metric table — set it via ``--bf16_until``;
        ``--bf16_until 0`` restores the pure 3-pass round-2 behavior."""
        return cls(jnp.float32, jnp.float32, "high", False, bf16_until=6)

    @classmethod
    def bf16(cls) -> "DtypePolicy":
        """Fast TPU path: bf16 matmuls (fp32 accumulation), tanh GELU."""
        return cls(jnp.float32, jnp.bfloat16, None, True)

    @classmethod
    def int8(cls) -> "DtypePolicy":
        """Quantized inference path: the bf16 fast path with the trunk's
        big matmuls (packed QKV, attn out, MLP) running int8 x int8 ->
        int32 on the MXU (2x bf16 peak); weights per-channel, activations
        per-token dynamic (ops/quant.py). Inference only."""
        return cls(jnp.float32, jnp.bfloat16, None, True, quant_int8=True)

    @classmethod
    def from_name(cls, name: str) -> "DtypePolicy":
        """CLI --precision string -> policy."""
        try:
            return {"fp32": cls.fp32, "fp32_high": cls.fp32_high,
                    "bf16": cls.bf16, "int8": cls.int8}[name]()
        except KeyError:
            raise ValueError(f"unknown precision {name!r}") from None


PRECISION_CHOICES = ("fp32", "fp32_high", "bf16", "int8")


VIT_L_14_336 = CLIPConfig()

# Tiny config for unit tests and the virtual-device dry run: 2-layer towers,
# 70-px images (5x5 grid), 64-wide vision, 32-wide text.
TINY_TEST = CLIPConfig(
    vision=VisionConfig(
        image_size=70,
        native_image_size=70,
        patch_size=14,
        width=64,
        layers=2,
        heads=4,
        output_dim=32,
    ),
    text=TextConfig(
        context_length=77,
        vocab_size=49408,
        width=32,
        heads=4,
        layers=2,
        output_dim=32,
    ),
    embed_dim=32,
)


MODEL_CONFIGS = {
    "ViT-L-14-336": VIT_L_14_336,
    "tiny-test": TINY_TEST,
}


def config_from_json(payload: dict) -> CLIPConfig:
    """Build a CLIPConfig from the reference's JSON schema
    (model/model_configs/*.json: embed_dim + vision_cfg + text_cfg)."""
    v = payload["vision_cfg"]
    t = payload["text_cfg"]
    embed = payload["embed_dim"]
    head_width = v.get("head_width", 64)
    return CLIPConfig(
        vision=VisionConfig(
            image_size=v["image_size"],
            native_image_size=v["image_size"],
            patch_size=v["patch_size"],
            width=v["width"],
            layers=v["layers"],
            heads=v["width"] // head_width,
            mlp_ratio=v.get("mlp_ratio", 4.0),
            output_dim=embed,
        ),
        text=TextConfig(
            context_length=t["context_length"],
            vocab_size=t["vocab_size"],
            width=t["width"],
            heads=t["heads"],
            layers=t["layers"],
            mlp_ratio=t.get("mlp_ratio", 4.0),
            output_dim=embed,
        ),
        embed_dim=embed,
        quick_gelu=payload.get("quick_gelu", False),
    )


def _scan_json_configs() -> None:
    """Populate MODEL_CONFIGS from model_configs/*.json (reference registry
    behavior, model/clip.py:23-44).  User dirs can be added via the
    AACLIP_MODEL_CONFIGS env var (os.pathsep-separated)."""
    import glob
    import json
    import os

    # user dirs are scanned LAST and allowed to override: AACLIP_MODEL_CONFIGS
    # is an explicit request, so a same-named JSON there replaces the
    # built-in registration instead of being silently dropped
    dirs = [(os.path.join(os.path.dirname(__file__), "model_configs"), False)]
    extra = os.environ.get("AACLIP_MODEL_CONFIGS")
    if extra:
        dirs += [(d, True) for d in extra.split(os.pathsep)]
    for d, override in dirs:
        for path in sorted(glob.glob(os.path.join(d, "*.json"))):
            name = os.path.splitext(os.path.basename(path))[0]
            if name in MODEL_CONFIGS and not override:
                continue
            try:
                with open(path) as f:
                    payload = json.load(f)
                if not all(k in payload
                           for k in ("embed_dim", "vision_cfg", "text_cfg")):
                    continue
                # schema conversion stays inside the guard: a user file
                # with the right top-level keys but bad inner fields must
                # not brick imports either
                parsed = config_from_json(payload)
            except Exception as e:
                if override:
                    # a malformed file in a USER config dir (editor swap
                    # file, half-written experiment) must not brick every
                    # import; warn with the culprit's name and skip it
                    import warnings
                    warnings.warn(
                        f"skipping unreadable model config {path!r}: {e}")
                    continue
                # a corrupt BUILT-IN config is a broken install: fail, but
                # name the file instead of an opaque import traceback
                raise RuntimeError(
                    f"could not load model config {path!r}: {e}") from e
            MODEL_CONFIGS[name] = parsed


_scan_json_configs()


def get_config(model_name: str, img_size: int | None = None) -> CLIPConfig:
    """Look up a named architecture, optionally overriding the run-time
    image size (reference behavior: model/clip.py:112)."""
    name = model_name.replace("/", "-")
    if name not in MODEL_CONFIGS:
        raise KeyError(
            f"Model config for {name} not found; available: {sorted(MODEL_CONFIGS)}"
        )
    cfg = MODEL_CONFIGS[name]
    if img_size is not None and img_size != cfg.vision.image_size:
        cfg = cfg.with_image_size(img_size)
    return cfg

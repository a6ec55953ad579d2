"""Object-style facades over the functional towers, mirroring the
reference's public surface (model/model.py:149-212 ``CLIP``,
model/adapter.py:6-145 ``AdaptedCLIP``) so reference users can migrate
without relearning the API.  State is immutable pytrees; every method
delegates to the pure functions in models/vit.py and models/text_model.py.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from aaclip_tpu.core.config import AdapterConfig, CLIPConfig, DtypePolicy
from aaclip_tpu.models import layers as L
from aaclip_tpu.models import text_model, vit


class CLIPModel:
    """Frozen two-tower CLIP (reference CLIP, model/model.py:149-212)."""

    def __init__(self, params: dict, cfg: CLIPConfig,
                 policy: DtypePolicy = DtypePolicy()):
        self.params = params
        self.cfg = cfg
        self.policy = policy

    def encode_image(self, images: jax.Array,
                     out_layers: Sequence[int] = (),
                     normalize: bool = False):
        pooled, taps = vit.encode_image(
            self.params["visual"], self.cfg, images, out_layers,
            policy=self.policy)
        if normalize:
            pooled = L.l2_normalize(pooled)
        return pooled, taps

    def encode_text(self, text: jax.Array, normalize: bool = False):
        out = text_model.encode_text(self.params["text"], self.cfg, text,
                                     policy=self.policy)
        return L.l2_normalize(out) if normalize else out

    @property
    def logit_scale(self) -> jax.Array:
        return jnp.exp(self.params["logit_scale"])

    def __call__(self, images: jax.Array, text: jax.Array):
        """Contrastive forward (reference model/model.py:203-212):
        (image_features, text_features, exp(logit_scale))."""
        img, _ = self.encode_image(images, normalize=True)
        txt = self.encode_text(text, normalize=True)
        return img, txt, self.logit_scale


class AdaptedCLIP:
    """Frozen CLIP + trainable adapters (reference model/adapter.py:6-145).

    ``forward(images) -> (seg_tokens, det_token)`` and
    ``encode_text(text, adapt_text=True)`` match the reference signatures.
    """

    def __init__(self, clip: CLIPModel, adapters: dict,
                 acfg: AdapterConfig = AdapterConfig()):
        self.clip = clip
        self.adapters = adapters
        self.acfg = acfg

    @classmethod
    def create(cls, cfg: CLIPConfig, acfg: AdapterConfig = AdapterConfig(),
               *, checkpoint: Optional[str] = None, seed: int = 0,
               policy: DtypePolicy = DtypePolicy()) -> "AdaptedCLIP":
        from aaclip_tpu.core.params import create_clip_params, init_adapter_params

        params = create_clip_params(cfg, checkpoint=checkpoint, seed=seed,
                                    policy=policy)
        adapters = init_adapter_params(jax.random.PRNGKey(seed), cfg, acfg,
                                       policy)
        return cls(CLIPModel(params, cfg, policy), adapters, acfg)

    def forward(self, images: jax.Array) -> Tuple[List[jax.Array], jax.Array]:
        return vit.adapted_forward(
            self.clip.params["visual"], self.adapters["image"],
            self.clip.cfg, images,
            image_adapt_weight=self.acfg.image_adapt_weight,
            levels=self.acfg.levels, proj_relu=self.acfg.proj_relu,
            policy=self.clip.policy)

    __call__ = forward

    def encode_text(self, text: jax.Array, adapt_text: bool = True) -> jax.Array:
        if not adapt_text:
            return self.clip.encode_text(text)
        return text_model.adapted_encode_text(
            self.clip.params["text"], self.adapters["text"], self.clip.cfg,
            text, text_adapt_weight=self.acfg.text_adapt_weight,
            policy=self.clip.policy)

    def surgery_features(self, images: jax.Array,
                         out_layers: Sequence[int] = (6, 12, 18, 24),
                         surgery_until_layer: int = 20) -> List[jax.Array]:
        return vit.surgery_patch_features(
            self.clip.params["visual"], self.clip.cfg, images, out_layers,
            surgery_until_layer, policy=self.clip.policy)

"""Model-config registry breadth: every registered OpenAI arch builds and
the smaller ones run a real forward (the ViT-L flagship is exercised at
production shape by the TPU bench/selfcheck; initializing its 428M random
params is too heavy for the CPU suite).

Reference registry behavior: model/clip.py:23-44 scans model_configs/*.json;
arch hyperparameters per config match the OpenAI releases.
"""

import jax
import numpy as np
import pytest

from aaclip_tpu.core.config import MODEL_CONFIGS, DtypePolicy, get_config
from aaclip_tpu.core.params import init_clip_params
from aaclip_tpu.models.vit import encode_image
from aaclip_tpu.ops.flash_attention import pallas_attention_supported


def test_all_registered_configs_are_consistent():
    assert {"ViT-L-14-336", "ViT-L-14", "ViT-B-16", "ViT-B-32",
            "ViT-B-16-quickgelu", "tiny-test"} <= set(MODEL_CONFIGS)
    for name in MODEL_CONFIGS:
        cfg = get_config(name)
        v, t = cfg.vision, cfg.text
        assert v.width % v.heads == 0 and t.width % t.heads == 0
        assert v.image_size % v.patch_size == 0
        # every real OpenAI geometry must tile the packed Pallas kernel
        if name != "tiny-test":
            assert pallas_attention_supported(v.heads, v.head_dim), name


def test_quickgelu_variant_differs_only_in_activation():
    a = get_config("ViT-B-16")
    b = get_config("ViT-B-16-quickgelu")
    assert not a.quick_gelu and b.quick_gelu
    assert a.vision == b.vision and a.text == b.text


@pytest.mark.parametrize("name", ["ViT-B-32", "ViT-B-16-quickgelu"])
def test_vit_b_forward_runs(name):
    """Smallest real arches: init + image forward with taps at a reduced
    image size (pos-embed grid scales with image_size)."""
    cfg = get_config(name, img_size=2 * get_config(name).vision.patch_size)
    params = init_clip_params(jax.random.PRNGKey(0), cfg,
                              DtypePolicy.fp32())["visual"]
    imgs = jax.random.normal(jax.random.PRNGKey(1),
                             (1, 3, cfg.vision.image_size,
                              cfg.vision.image_size))
    pooled, taps = encode_image(params, cfg, imgs, (6, cfg.vision.layers))
    assert pooled.shape == (1, cfg.vision.output_dim)
    assert len(taps) == 2
    assert taps[0].shape == (1, cfg.vision.seq_len, cfg.vision.width)
    assert np.isfinite(np.asarray(pooled)).all()

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


def test_img_size_must_divide_patch_size():
    """A non-multiple img_size would die in an opaque reshape inside the
    jitted trace; the config rejects it up front."""
    import pytest

    with pytest.raises(ValueError, match="not a multiple"):
        get_config("ViT-L-14-336", img_size=520)


def test_user_config_dir_overrides_builtin(tmp_path, monkeypatch):
    """AACLIP_MODEL_CONFIGS entries are explicit user requests: a
    same-named JSON there replaces the built-in registration instead of
    being silently dropped; malformed files there warn and skip."""
    import json
    import os
    import warnings

    from aaclip_tpu.core import config as C

    src = os.path.join(os.path.dirname(C.__file__), "model_configs",
                       "ViT-B-16.json")
    payload = json.load(open(src))
    payload["embed_dim"] = 123
    (tmp_path / "ViT-B-16.json").write_text(json.dumps(payload))
    (tmp_path / "broken.json").write_text("{not json")
    saved = C.MODEL_CONFIGS["ViT-B-16"]
    monkeypatch.setenv("AACLIP_MODEL_CONFIGS", str(tmp_path))
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            C._scan_json_configs()
        assert C.MODEL_CONFIGS["ViT-B-16"].embed_dim == 123
        assert any("broken.json" in str(x.message) for x in w)
    finally:
        C.MODEL_CONFIGS["ViT-B-16"] = saved


def test_env_checkpoint_overrides_bundled(tmp_path, monkeypatch):
    """AACLIP_CKPT is an explicit override: it must win over any bundled
    default checkpoint."""
    from aaclip_tpu.core import params as P

    bundled = tmp_path / "bundled.pt"
    bundled.write_bytes(b"x")
    override = tmp_path / "override.pt"
    override.write_bytes(b"y")
    monkeypatch.setattr(P, "DEFAULT_CKPT_PATHS", [str(bundled)])
    monkeypatch.setenv("AACLIP_CKPT", str(override))
    assert P.find_default_checkpoint() == str(override)
    monkeypatch.delenv("AACLIP_CKPT")
    assert P.find_default_checkpoint() == str(bundled)


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

"""Object-API facade: matches the functional paths and exposes the
reference-shaped surface."""

import numpy as np
import jax.numpy as jnp

from aaclip_tpu.core.config import AdapterConfig, get_config
from aaclip_tpu.models.clip import AdaptedCLIP
from aaclip_tpu.models.text_model import encode_text
from aaclip_tpu.models.vit import adapted_forward
from aaclip_tpu.text.bpe import tokenize

CFG = get_config("tiny-test")
ACFG = AdapterConfig(levels=(1, 2), image_adapt_until=1, text_adapt_until=1)


def test_facade_matches_functional():
    model = AdaptedCLIP.create(CFG, ACFG, seed=0)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.standard_normal((2, 3, 70, 70)), jnp.float32)
    seg_f, det_f = adapted_forward(
        model.clip.params["visual"], model.adapters["image"], CFG, images,
        levels=ACFG.levels)
    seg_o, det_o = model(images)
    for a, b in zip(seg_f, seg_o):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(det_f), np.asarray(det_o))

    text = jnp.asarray(tokenize(["a photo of dark bottle."]))
    np.testing.assert_array_equal(
        np.asarray(model.encode_text(text, adapt_text=False)),
        np.asarray(encode_text(model.clip.params["text"], CFG, text)))
    assert model.encode_text(text).shape == (1, CFG.text.width)


def test_contrastive_forward():
    model = AdaptedCLIP.create(CFG, ACFG, seed=0)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.standard_normal((2, 3, 70, 70)), jnp.float32)
    text = jnp.asarray(tokenize(["a photo of dark bottle.", "the cable."]))
    img, txt, scale = model.clip(images, text)
    assert img.shape == (2, CFG.embed_dim) and txt.shape == (2, CFG.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img), axis=-1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(float(scale), 1.0 / 0.07, rtol=1e-5)
    sf = model.surgery_features(images, out_layers=(1, 2),
                                surgery_until_layer=2)
    assert len(sf) == 2 and sf[0].shape == (2, 25, CFG.embed_dim)


def test_inference_runtime_is_torch_free():
    """The compute path must not import torch (host converter only)."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from aaclip_tpu.core.config import get_config, AdapterConfig\n"
        "from aaclip_tpu.core.params import create_clip_params, init_adapter_params\n"
        "from aaclip_tpu.eval.predict import make_predict_fn\n"
        "from aaclip_tpu.text.anchors import encode_dataset_anchors\n"
        "from aaclip_tpu.eval.metrics import metrics_eval\n"
        "assert 'torch' not in sys.modules, 'torch leaked into the runtime'\n"
        "print('TORCH_FREE_OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env={**__import__('os').environ,
                                        "JAX_PLATFORMS": "cpu"})
    assert "TORCH_FREE_OK" in r.stdout, r.stderr[-500:]


def test_model_config_registry_families():
    """Every registered architecture JSON builds and runs both towers
    (tiny img_size keeps the grids small); the -quickgelu variant diverges
    from its erf sibling on identical weights (reference model/clip.py:23-44
    scans model_configs/*.json the same way)."""
    from aaclip_tpu.core.config import MODEL_CONFIGS
    from aaclip_tpu.core.params import create_clip_params
    from aaclip_tpu.models.vit import encode_image

    for name in ["ViT-L-14-336", "ViT-L-14", "ViT-B-16", "ViT-B-32",
                 "ViT-B-16-quickgelu"]:
        assert name in MODEL_CONFIGS, sorted(MODEL_CONFIGS)

    outs = {}
    for name in ["ViT-B-16", "ViT-B-16-quickgelu"]:
        cfg = get_config(name, img_size=32)  # 2x2 grid
        assert cfg.vision.grid == 2
        clip = create_clip_params(cfg, seed=0)
        imgs = jnp.asarray(np.random.default_rng(1).standard_normal(
            (1, 3, 32, 32)), jnp.float32)
        pooled, taps = encode_image(clip["visual"], cfg, imgs, out_layers=[12])
        assert pooled.shape == (1, cfg.embed_dim)
        assert taps[0].shape == (1, 5, cfg.vision.width)
        tokens = jnp.array([[49406, 320, 49407] + [0] * 74])
        txt = encode_text(clip["text"], cfg, tokens)
        assert txt.shape == (1, cfg.embed_dim)
        outs[name] = np.asarray(pooled)
    # same weights, different activation -> different outputs
    assert np.abs(outs["ViT-B-16"] - outs["ViT-B-16-quickgelu"]).max() > 1e-4

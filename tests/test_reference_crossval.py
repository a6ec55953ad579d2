"""End-to-end cross-validation against the reference implementation itself.

Every other parity test validates a layer or an op; this one closes the loop
on *wiring*: it builds the reference's torch ``AdaptedCLIP`` (random init,
the real ViT-L architecture at a small image size), carries the SAME weights
into this framework through the public checkpoint interop (CLIP state_dict
-> ``load_openai_checkpoint``; adapter state_dicts -> the ``.pth`` interop
loader) and asserts the adapted visual forward, adapted text encoder, plain
text encoder, and fused stage-1 surgery features agree numerically with the
reference modules run on the same inputs.

This is the strongest verification available without the real
``ViT-L-14-336px.pt`` (absent from this image, docs/PARITY.md): it shows the
*implementations* agree end-to-end at the production architecture, confining
the remaining real-weights risk to the (format-tested) checkpoint loader.

Reference code exercised: model/adapter.py:67-145 (AdaptedCLIP forward +
encode_text), model/model.py:185-201 (encode_image/encode_text),
model/transformer.py:407-425 (DAPM_replace surgery), train.py:75-85
(stage-1 feature math). Skipped when /root/reference is not present.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference repo not present")

IMG = 42          # 3x3 grid at patch 14 — smallest ViT-L-14 image size
BATCH = 2
SURGERY_UNTIL = 20
PROMPTS = ["a photo of a normal bottle", "a photo of an anomalous cable"]


def _stub_modules(names_attrs):
    """Install inert module stubs so reference imports resolve; returns a
    cleanup fn that removes every stub we installed from sys.modules — the
    reference modules keep their bound references, while later real imports
    (e.g. transformers probing find_spec('ftfy'), which raises ValueError
    on a spec-less stub) see the true state again."""
    installed = []
    for name, attrs in names_attrs.items():
        if name in sys.modules:
            continue
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        installed.append(name)
    def cleanup():
        for name in installed:
            sys.modules.pop(name, None)
    return cleanup


def _import_reference():
    """Import the reference's model package (namespace package, no
    __init__.py). ipdb is imported-but-unused there and isn't installed
    here — satisfy the import with an empty stub."""
    cleanup = _stub_modules({"ipdb": {}})
    sys.path.insert(0, REF)
    try:
        from model.adapter import AdaptedCLIP
        from model.clip import create_model
    finally:
        sys.path.remove(REF)
        cleanup()
    return create_model, AdaptedCLIP


@pytest.fixture(scope="module")
def crossval(tmp_path_factory):
    """Run the reference torch models once, export their weights, load them
    through our converters, and hand both sides' outputs to the tests."""
    import torch

    create_model, AdaptedCLIP = _import_reference()
    workdir = tmp_path_factory.mktemp("crossval")

    torch.manual_seed(0)
    clip_t = create_model("ViT-L-14-336", IMG, force_image_size=IMG).eval()
    adapted_t = AdaptedCLIP(clip_t, relu=False).eval()

    # the reference builds a SECOND model from the same checkpoint and
    # rewires its tail with V-V attention (train.py:234-243)
    surgery_t = create_model("ViT-L-14-336", IMG, force_image_size=IMG).eval()
    surgery_t.load_state_dict(clip_t.state_dict())
    surgery_t.visual.DAPM_replace(DPAM_layer=SURGERY_UNTIL)

    from aaclip_tpu.text.bpe import tokenize
    tokens_np = np.asarray(tokenize(PROMPTS))

    gen = torch.Generator().manual_seed(7)
    images_t = torch.randn(BATCH, 3, IMG, IMG, generator=gen)
    tokens_t = torch.from_numpy(tokens_np).long()

    ref = {}
    with torch.no_grad():
        seg_t, det_t = adapted_t(images_t)
        ref["seg"] = [t.numpy() for t in seg_t]
        ref["det"] = det_t.numpy()
        ref["text_adapted"] = adapted_t.encode_text(tokens_t).numpy()
        ref["text_plain"] = clip_t.encode_text(tokens_t).numpy()

        # stage-1 supervision features, reference train.py:75-85: last
        # tapped level of the surgery tower + the frozen model's CLS
        _, patch_feats = surgery_t.encode_image(images_t, [24])
        cls_tok, _ = clip_t.encode_image(images_t, [])
        cls_tok = cls_tok / cls_tok.norm(dim=-1, keepdim=True)
        f = surgery_t.visual.ln_post(patch_feats[-1][:, 1:, :])
        f = f @ surgery_t.visual.proj
        f = f / f.norm(dim=-1, keepdim=True)
        ref["stage1"] = (f + cls_tok.unsqueeze(1)).numpy()

    # ---- carry the weights across through the public interop -------------
    ckpt_path = os.path.join(workdir, "clip_random.pt")
    torch.save(clip_t.state_dict(), ckpt_path)
    text_pth = os.path.join(workdir, "text_adapter.pth")
    image_pth = os.path.join(workdir, "image_adapter.pth")
    torch.save({"epoch": 1, "text_adapter": adapted_t.text_adapter.state_dict()},
               text_pth)
    torch.save({"epoch": 1,
                "image_adapter": adapted_t.image_adapter.state_dict()},
               image_pth)
    del clip_t, adapted_t, surgery_t

    from aaclip_tpu.core.config import AdapterConfig, DtypePolicy, get_config
    from aaclip_tpu.core.params import create_clip_params
    from aaclip_tpu.train.checkpoint import load_reference_checkpoint

    cfg = get_config("ViT-L-14-336", IMG)
    acfg = AdapterConfig()  # reference CLI defaults (proj_relu=False)
    policy = DtypePolicy.from_name("fp32")
    clip_params = create_clip_params(cfg, checkpoint=ckpt_path, policy=policy)
    _, text_adapter = load_reference_checkpoint(
        text_pth, "text", n_adapt=acfg.text_adapt_until)
    _, image_adapter = load_reference_checkpoint(
        image_pth, "image", n_adapt=acfg.image_adapt_until,
        n_levels=len(acfg.levels))

    return types.SimpleNamespace(
        ref=ref, cfg=cfg, acfg=acfg, policy=policy,
        clip_params=clip_params, text_adapter=text_adapter,
        image_adapter=image_adapter, images=np.asarray(images_t.numpy()),
        tokens=tokens_np,
    )


def _maxdiff(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def test_adapted_visual_forward_matches_reference(crossval):
    """reference model/adapter.py:67-112 vs models/vit.py::adapted_forward."""
    from aaclip_tpu.models.vit import adapted_forward

    cv = crossval
    seg, det = adapted_forward(
        cv.clip_params["visual"], cv.image_adapter, cv.cfg,
        cv.images, image_adapt_weight=cv.acfg.image_adapt_weight,
        levels=cv.acfg.levels, proj_relu=cv.acfg.proj_relu, policy=cv.policy)
    assert len(seg) == len(cv.ref["seg"])
    for ours, theirs in zip(seg, cv.ref["seg"]):
        assert _maxdiff(ours, theirs) < 2e-4  # L2-normalized, |.| <= 1
    assert _maxdiff(det, cv.ref["det"]) < 2e-4


def test_adapted_text_encoder_matches_reference(crossval):
    """reference model/adapter.py:114-145 vs adapted_encode_text."""
    from aaclip_tpu.models.text_model import adapted_encode_text

    cv = crossval
    ours = adapted_encode_text(
        cv.clip_params["text"], cv.text_adapter, cv.cfg, cv.tokens,
        text_adapt_weight=cv.acfg.text_adapt_weight, policy=cv.policy)
    scale = float(np.max(np.abs(cv.ref["text_adapted"])))
    assert _maxdiff(ours, cv.ref["text_adapted"]) < 5e-4 * max(scale, 1.0)


def test_plain_text_encoder_matches_reference(crossval):
    """reference model/model.py:190-201 (text_projection path) vs
    encode_text — the anchor path when no text adapter is trained."""
    from aaclip_tpu.models.text_model import encode_text

    cv = crossval
    ours = encode_text(cv.clip_params["text"], cv.cfg, cv.tokens,
                       policy=cv.policy)
    scale = float(np.max(np.abs(cv.ref["text_plain"])))
    assert _maxdiff(ours, cv.ref["text_plain"]) < 5e-4 * max(scale, 1.0)


def _import_reference_forward_utils():
    """Import reference forward_utils.py. Its module-level imports pull in
    kornia / torchvision / ftfy / ipdb, none installed here; the code paths
    this test exercises never call them, so satisfy the imports with inert
    stubs (the blur stub raises if the untested path is ever reached), then
    drop the stubs from sys.modules so they can't shadow real-availability
    probes in unrelated tests."""
    def _no_blur(*a, **k):
        raise AssertionError("gaussian_blur2d must not run in train mode")

    tf_attrs = dict(Compose=object, Resize=object, CenterCrop=object,
                    ToTensor=object, Normalize=object)
    cleanup = _stub_modules({
        "ipdb": {},
        "kornia.filters": {"gaussian_blur2d": _no_blur},
        "kornia": {},
        "torchvision.transforms": tf_attrs,
        "torchvision": {},
        "ftfy": {"fix_text": lambda s: s},
    })
    if "kornia" in sys.modules and "kornia.filters" in sys.modules:
        sys.modules["kornia"].filters = sys.modules["kornia.filters"]
    if "torchvision" in sys.modules and "torchvision.transforms" in sys.modules:
        sys.modules["torchvision"].transforms = \
            sys.modules["torchvision.transforms"]
    sys.path.insert(0, REF)
    try:
        import forward_utils as fu
    finally:
        sys.path.remove(REF)
        cleanup()
    return fu


def test_stage1_loss_chain_matches_reference():
    """The fused-logit stage-1 loss (ops/similarity.train_similarity_logit +
    ops/losses.seg_loss_from_logit_masked + orthogonality) equals the
    reference's actual calculate_similarity_map -> calculate_seg_loss ->
    orthogonality chain (reference forward_utils.py:196-231 +
    train.py:87-96, last-level effective loss) on the same inputs."""
    import torch

    import jax.numpy as jnp

    from aaclip_tpu.ops import losses as LL
    from aaclip_tpu.ops.similarity import train_similarity_logit

    fu = _import_reference_forward_utils()
    rng = np.random.default_rng(3)
    B, grid, D, img = 3, 6, 16, 48
    feats = rng.standard_normal((B, grid * grid, D)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    anch = rng.standard_normal((B, D, 2)).astype(np.float32)
    anch /= np.linalg.norm(anch, axis=1, keepdims=True)
    mask = (rng.random((B, img, img)) > 0.7).astype(np.float32)
    w = 0.1  # --text_norm_weight default

    f_t, a_t, m_t = map(torch.from_numpy, (feats, anch, mask))
    with torch.no_grad():
        pp = fu.calculate_similarity_map(f_t, a_t, img)
        want = fu.calculate_seg_loss(pp, m_t)
        want = want + w * ((a_t[:, :, 0] * a_t[:, :, 1]).sum(1).mean()) ** 2
    want = float(want)

    scores = 100.0 * jnp.einsum("bld,bdk->blk", jnp.asarray(feats),
                                jnp.asarray(anch),
                                preferred_element_type=jnp.float32,
                                precision="highest")
    d = train_similarity_logit(scores, img)
    valid = jnp.ones((B,), jnp.float32)
    got = (LL.seg_loss_from_logit_masked(d, jnp.asarray(mask), valid)
           + w * LL.orthogonality_loss_masked(jnp.asarray(anch), valid))
    assert abs(float(got) - want) < 1e-4 * max(1.0, abs(want)), (float(got), want)


def test_anchor_build_matches_reference():
    """Prompt set + tokenizer ids + anchor reduction, end-to-end vs the
    reference's actual get_adapted_single_class_text_embedding
    (forward_utils.py:138-163). Both sides share one deterministic fake
    text encoder (a fixed projection of the token ids), so any divergence
    in prompt strings, tokenization, or the normalize-mean-normalize-stack
    reduction shows up as an anchor mismatch."""
    import torch

    import jax.numpy as jnp

    from aaclip_tpu.text.anchors import encode_dataset_anchors

    fu = _import_reference_forward_utils()
    rng = np.random.default_rng(11)
    W = (rng.standard_normal((77, 24)) / 8).astype(np.float32)

    def embed_np(tok):
        return np.tanh(tok.astype(np.float32) / 1000.0 @ W)

    class FakeModel:
        def encode_text(self, tokens):
            return torch.from_numpy(embed_np(tokens.numpy()))

    with torch.no_grad():
        want = fu.get_adapted_single_class_text_embedding(
            FakeModel(), "MVTec", "bottle", "cpu").numpy()
    got = np.asarray(encode_dataset_anchors(
        lambda t: jnp.asarray(embed_np(np.asarray(t))),
        "MVTec", ["bottle"])["bottle"])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_stage2_detection_loss_matches_reference():
    """Stage-2 detection CE: raw (unscaled) det-anchor logits through
    F.cross_entropy (reference train.py:147-150) == the masked CE here."""
    import torch
    import torch.nn.functional as F

    import jax.numpy as jnp

    from aaclip_tpu.ops import losses as LL

    rng = np.random.default_rng(4)
    B, D = 5, 16
    det = rng.standard_normal((B, D)).astype(np.float32)
    det /= np.linalg.norm(det, axis=-1, keepdims=True)
    anch = rng.standard_normal((B, D, 2)).astype(np.float32)
    anch /= np.linalg.norm(anch, axis=1, keepdims=True)
    label = rng.integers(0, 2, B)

    with torch.no_grad():
        cls_preds = torch.matmul(torch.from_numpy(det).unsqueeze(1),
                                 torch.from_numpy(anch))[:, 0]
        want = float(F.cross_entropy(cls_preds, torch.from_numpy(label)))

    logits = jnp.einsum("bd,bdk->bk", jnp.asarray(det), jnp.asarray(anch),
                        preferred_element_type=jnp.float32,
                        precision="highest")
    got = float(LL.cross_entropy_logits_masked(
        logits, jnp.asarray(label, jnp.int32), jnp.ones((B,), jnp.float32)))
    assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (got, want)


@pytest.mark.parametrize("domain", ["Industrial", "Medical"])
def test_eval_map_chain_matches_reference(domain):
    """The fused M(sum q)M^T eval map (ops/similarity.eval_anomaly_map)
    equals the reference's own per-level calculate_similarity_map(test=True)
    summed over levels (reference test.py:87-93, forward_utils.py:196-216).

    The only piece the reference path can't supply here is kornia's
    gaussian_blur2d (kornia is not installed); it is provided as a faithful
    separable reflect-pad convolution built on the already-torch-validated
    ops/blur.gaussian_kernel_1d, so everything else — the (s1+1-s0)/2
    arithmetic, blur->bilinear order, align_corners upsample, domain kernel
    selection — runs the reference's code."""
    import torch
    import torch.nn.functional as F

    import jax.numpy as jnp

    from aaclip_tpu.ops.blur import gaussian_kernel_1d
    from aaclip_tpu.ops.similarity import eval_anomaly_map, image_score

    fu = _import_reference_forward_utils()

    def faithful_blur(x, ksize, sigma):
        g = torch.from_numpy(gaussian_kernel_1d(ksize[0], sigma[0]))
        pad = ksize[0] // 2
        xp = F.pad(x, (pad, pad, pad, pad), mode="reflect")
        xp = F.conv2d(xp, g.view(1, 1, 1, -1))
        return F.conv2d(xp, g.view(1, 1, -1, 1))

    orig = fu.gaussian_blur2d
    fu.gaussian_blur2d = faithful_blur
    try:
        rng = np.random.default_rng(9)
        n, B, grid, D, img = 2, 3, 6, 16, 50
        seg = rng.standard_normal((n, B, grid * grid, D)).astype(np.float32)
        seg /= np.linalg.norm(seg, axis=-1, keepdims=True)
        anch = rng.standard_normal((D, 2)).astype(np.float32)
        anch /= np.linalg.norm(anch, axis=0, keepdims=True)
        det = rng.standard_normal((B, D)).astype(np.float32)
        det /= np.linalg.norm(det, axis=-1, keepdims=True)

        a_t = torch.from_numpy(anch)
        with torch.no_grad():
            per_level = [fu.calculate_similarity_map(
                torch.from_numpy(seg[i]), a_t, img, test=True, domain=domain)
                for i in range(n)]
            want = torch.cat(per_level, dim=1).sum(1).numpy()
            want_score = ((torch.from_numpy(det) @ a_t)[:, 1] + 1) / 2
    finally:
        fu.gaussian_blur2d = orig

    got = np.asarray(eval_anomaly_map(jnp.asarray(seg), jnp.asarray(anch),
                                      img, domain))
    np.testing.assert_allclose(got, want, atol=2e-4)
    np.testing.assert_allclose(np.asarray(image_score(jnp.asarray(det),
                                                      jnp.asarray(anch))),
                               want_score.numpy(), atol=1e-6)


@pytest.mark.parametrize("domain", ["Industrial", "Medical"])
def test_metrics_eval_matches_reference(domain):
    """Per-class metric rows vs the reference's actual metrics_eval
    (forward_utils.py:233-280): the max!=1 normalization guard, the
    normalize-THEN-mix image aggregation (pmax*0.5 + image*0.5 — the mix
    depends on the per-class normalization), the Medical pmax-only branch,
    and the rounding all have to line up."""
    fu = _import_reference_forward_utils()
    from aaclip_tpu.eval.metrics import metrics_eval

    rng = np.random.default_rng(13)
    B, H = 8, 24
    pixel_label = (rng.random((B, H, H)) > 0.9).astype(np.int64)
    pixel_label[0] = 0  # mixed labels overall, one all-normal sample
    image_label = (np.arange(B) % 2).astype(np.int64)
    pixel_preds = rng.random((B, H, H)).astype(np.float64)
    image_preds = rng.random(B).astype(np.float64)

    want = fu.metrics_eval(pixel_label.copy(), image_label.copy(),
                           pixel_preds.copy(), image_preds.copy(),
                           "bottle", domain)
    got = metrics_eval(pixel_label, image_label, pixel_preds, image_preds,
                       "bottle", domain)
    for key in ("pixel AUC", "pixel AP", "image AUC", "image AP"):
        assert abs(got[key] - want[key]) < 1e-9, (key, got[key], want[key])


def test_stage1_features_match_reference(crossval):
    """reference train.py:75-85 (two full towers) vs the fused
    shared-prefix stage1_features_fn."""
    from aaclip_tpu.train.steps import stage1_features_fn

    cv = crossval
    feats_fn = stage1_features_fn(
        cv.clip_params, cv.cfg, surgery_until_layer=SURGERY_UNTIL,
        policy=cv.policy)
    ours = feats_fn(cv.images)
    assert _maxdiff(ours, cv.ref["stage1"]) < 4e-4  # sum of two unit vectors


VIT_B_IMG = 48  # 3x3 grid at patch 16 — smallest ViT-B-16 image size


def test_quickgelu_towers_match_reference(tmp_path):
    """Second-architecture cross-validation: the reference's torch ``CLIP``
    built with ``quick_gelu=True`` at ViT-B-16 geometry (model/model.py:84,
    129 — QuickGELU activation in BOTH towers) vs our ``ViT-B-16-quickgelu``
    zoo config, weights carried through the same public checkpoint interop.

    The main crossval fixture covers the production erf-GELU ViT-L path;
    this one exercises everything that differs by architecture: the
    quick_gelu activation wiring (core/config.py::config_act), the
    shape-sniffing converter on a second geometry (12-layer width-768
    vision tower, width-512 8-head text tower), the non-square vision
    projection 768->512, and derived vision heads (width/64 = 12, the
    reference's CLIPVisionCfg.head_width rule)."""
    import torch

    cleanup = _stub_modules({"ipdb": {}})
    sys.path.insert(0, REF)
    try:
        from model.model import CLIP
    finally:
        sys.path.remove(REF)
        cleanup()

    from aaclip_tpu.core.config import DtypePolicy, get_config

    cfg = get_config("ViT-B-16-quickgelu", VIT_B_IMG)
    assert cfg.quick_gelu, "zoo config must carry the quick_gelu flag"
    policy = DtypePolicy.from_name("fp32")

    torch.manual_seed(21)
    clip_t = CLIP(
        embed_dim=cfg.embed_dim,
        vision_cfg=dict(image_size=VIT_B_IMG, layers=cfg.vision.layers,
                        width=cfg.vision.width,
                        patch_size=cfg.vision.patch_size),
        text_cfg=dict(context_length=cfg.text.context_length,
                      vocab_size=cfg.text.vocab_size, width=cfg.text.width,
                      heads=cfg.text.heads, layers=cfg.text.layers),
        quick_gelu=True,
    ).eval()
    mlp_mods = [m.__class__.__name__
                for m in clip_t.visual.transformer.resblocks[0].mlp]
    assert "QuickGELU" in mlp_mods, mlp_mods  # really on the quick-gelu path

    from aaclip_tpu.text.bpe import tokenize
    tokens_np = np.asarray(tokenize(PROMPTS))
    gen = torch.Generator().manual_seed(22)
    images_t = torch.randn(BATCH, 3, VIT_B_IMG, VIT_B_IMG, generator=gen)

    taps = (6, 12)
    with torch.no_grad():
        pooled_t, taps_t = clip_t.encode_image(images_t, list(taps))
        text_t = clip_t.encode_text(torch.from_numpy(tokens_np).long())

    ckpt = os.path.join(tmp_path, "vitb16_quickgelu_random.pt")
    torch.save(clip_t.state_dict(), ckpt)
    del clip_t

    from aaclip_tpu.core.params import create_clip_params
    from aaclip_tpu.models.text_model import encode_text
    from aaclip_tpu.models.vit import encode_image

    clip_params = create_clip_params(cfg, checkpoint=ckpt, policy=policy)
    pooled, tap_list = encode_image(
        clip_params["visual"], cfg, np.asarray(images_t.numpy()),
        out_layers=taps, policy=policy)
    ours_text = encode_text(clip_params["text"], cfg, tokens_np,
                            policy=policy)

    scale = float(np.max(np.abs(pooled_t.numpy())))
    assert _maxdiff(pooled, pooled_t.numpy()) < 5e-4 * max(scale, 1.0)
    for ours, theirs in zip(tap_list, taps_t):
        s = float(np.max(np.abs(theirs.numpy())))
        assert _maxdiff(ours, theirs.numpy()) < 5e-4 * max(s, 1.0)
    s = float(np.max(np.abs(text_t.numpy())))
    assert _maxdiff(ours_text, text_t.numpy()) < 5e-4 * max(s, 1.0)

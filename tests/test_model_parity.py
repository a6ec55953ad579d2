"""Full-tower parity: build a synthetic OpenAI-format torch state dict, run
an equivalent torch forward assembled from torch primitives, convert the
state dict with the framework's converter, and compare encode_image /
encode_text / surgery / adapted forwards."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from aaclip_tpu.core.config import CLIPConfig, TextConfig, VisionConfig, AdapterConfig
from aaclip_tpu.core.params import (
    convert_openai_state_dict,
    init_adapter_params,
    resize_pos_embed,
)
from aaclip_tpu.models.text_model import adapted_encode_text, encode_text
from aaclip_tpu.models.vit import adapted_forward, encode_image, surgery_patch_features

CFG = CLIPConfig(
    vision=VisionConfig(image_size=42, native_image_size=42, patch_size=14,
                        width=48, layers=3, heads=4, output_dim=24),
    text=TextConfig(context_length=12, vocab_size=100, width=24, heads=4,
                    layers=2, output_dim=24),
    embed_dim=24,
)


def _make_state_dict(cfg: CLIPConfig, seed=0) -> dict:
    """Synthetic weights in OpenAI checkpoint layout."""
    g = torch.Generator().manual_seed(seed)
    v, t = cfg.vision, cfg.text

    def r(*shape, s=0.05):
        return torch.randn(*shape, generator=g) * s

    sd = {
        "visual.conv1.weight": r(v.width, 3, v.patch_size, v.patch_size),
        "visual.class_embedding": r(v.width),
        "visual.positional_embedding": r(v.seq_len, v.width),
        "visual.ln_pre.weight": 1 + r(v.width), "visual.ln_pre.bias": r(v.width),
        "visual.ln_post.weight": 1 + r(v.width), "visual.ln_post.bias": r(v.width),
        "visual.proj": r(v.width, v.output_dim),
        "token_embedding.weight": r(t.vocab_size, t.width),
        "positional_embedding": r(t.context_length, t.width),
        "ln_final.weight": 1 + r(t.width), "ln_final.bias": r(t.width),
        "text_projection": r(t.width, t.output_dim),
        "logit_scale": torch.tensor(math.log(1 / 0.07)),
    }
    for tower, n_layers, width in [("visual.transformer", v.layers, v.width),
                                   ("transformer", t.layers, t.width)]:
        for i in range(n_layers):
            p = f"{tower}.resblocks.{i}"
            sd.update({
                f"{p}.ln_1.weight": 1 + r(width), f"{p}.ln_1.bias": r(width),
                f"{p}.attn.in_proj_weight": r(3 * width, width, s=width ** -0.5),
                f"{p}.attn.in_proj_bias": r(3 * width),
                f"{p}.attn.out_proj.weight": r(width, width, s=width ** -0.5),
                f"{p}.attn.out_proj.bias": r(width),
                f"{p}.ln_2.weight": 1 + r(width), f"{p}.ln_2.bias": r(width),
                f"{p}.mlp.c_fc.weight": r(4 * width, width, s=width ** -0.5),
                f"{p}.mlp.c_fc.bias": r(4 * width),
                f"{p}.mlp.c_proj.weight": r(width, 4 * width, s=width ** -0.5),
                f"{p}.mlp.c_proj.bias": r(width),
            })
    return sd


def _torch_block(sd, prefix, x, width, heads, attn_mask=None, vv=False):
    """One pre-LN residual block from raw state-dict tensors, batch-first.

    ``vv="batch"`` transcribes the reference's surgery quirk literally: the
    surgery ``Attention`` assumes batch-first input (reference
    model/transformer.py:126 ``B, N, C = q_x.shape``) but the tower feeds
    it seq-first LND (model/transformer.py:528), so V-V attention runs
    across the batch at each position.  ``vv="spatial"`` is the intended
    per-sample spatial V-V form.
    """
    ln = lambda y, p: F.layer_norm(y, (width,), sd[f"{p}.weight"], sd[f"{p}.bias"])
    h = ln(x, f"{prefix}.ln_1")
    hd = width // heads
    if vv == "batch":
        z = h.permute(1, 0, 2)  # batch-first -> the LND the tower feeds
        qkv = z @ sd[f"{prefix}.attn.in_proj_weight"].T + sd[f"{prefix}.attn.in_proj_bias"]
        L, N, _ = z.shape     # reference reads these as (B, N, C)
        v = qkv[..., 2 * width:].reshape(L, N, heads, hd).permute(0, 2, 1, 3)
        attn = ((v @ v.transpose(-2, -1)) * hd ** -0.5).softmax(-1)
        a = (attn @ v).permute(0, 2, 1, 3).reshape(L, N, width)
        a = a @ sd[f"{prefix}.attn.out_proj.weight"].T + sd[f"{prefix}.attn.out_proj.bias"]
        a = a.permute(1, 0, 2)  # back to batch-first
    elif vv == "spatial":
        qkv = h @ sd[f"{prefix}.attn.in_proj_weight"].T + sd[f"{prefix}.attn.in_proj_bias"]
        B, N, _ = h.shape
        v = qkv[..., 2 * width:].reshape(B, N, heads, hd).permute(0, 2, 1, 3)
        attn = ((v @ v.transpose(-2, -1)) * hd ** -0.5).softmax(-1)
        a = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, width)
        a = a @ sd[f"{prefix}.attn.out_proj.weight"].T + sd[f"{prefix}.attn.out_proj.bias"]
    else:
        m = torch.nn.MultiheadAttention(width, heads, batch_first=True)
        with torch.no_grad():
            m.in_proj_weight.copy_(sd[f"{prefix}.attn.in_proj_weight"])
            m.in_proj_bias.copy_(sd[f"{prefix}.attn.in_proj_bias"])
            m.out_proj.weight.copy_(sd[f"{prefix}.attn.out_proj.weight"])
            m.out_proj.bias.copy_(sd[f"{prefix}.attn.out_proj.bias"])
        a = m.eval()(h, h, h, attn_mask=attn_mask, need_weights=False)[0]
    x = x + a
    h2 = ln(x, f"{prefix}.ln_2")
    mlp = F.gelu(h2 @ sd[f"{prefix}.mlp.c_fc.weight"].T + sd[f"{prefix}.mlp.c_fc.bias"])
    mlp = mlp @ sd[f"{prefix}.mlp.c_proj.weight"].T + sd[f"{prefix}.mlp.c_proj.bias"]
    return x + mlp


def _torch_vision_trunk(sd, cfg, images, vv_start=None, vv_mode="batch"):
    """Patchify -> blocks; returns per-layer token list (batch-first)."""
    v = cfg.vision
    x = F.conv2d(images, sd["visual.conv1.weight"], stride=v.patch_size)
    x = x.reshape(x.shape[0], v.width, -1).permute(0, 2, 1)
    cls = sd["visual.class_embedding"].expand(x.shape[0], 1, v.width)
    x = torch.cat([cls, x], dim=1) + sd["visual.positional_embedding"]
    x = F.layer_norm(x, (v.width,), sd["visual.ln_pre.weight"], sd["visual.ln_pre.bias"])
    outs = []
    for i in range(v.layers):
        vv = vv_mode if (vv_start is not None and i >= vv_start) else False
        x = _torch_block(sd, f"visual.transformer.resblocks.{i}", x,
                         v.width, v.heads, vv=vv)
        outs.append(x)
    return outs


@pytest.fixture(scope="module")
def setup():
    sd = _make_state_dict(CFG)
    params = jax.tree.map(jnp.asarray, convert_openai_state_dict(sd, CFG))
    with torch.no_grad():
        images = torch.randn(2, 3, 42, 42, generator=torch.Generator().manual_seed(7))
    return sd, params, images


def test_encode_image_parity(setup):
    sd, params, images = setup
    v = CFG.vision
    with torch.no_grad():
        outs = _torch_vision_trunk(sd, CFG, images)
        pooled = F.layer_norm(outs[-1][:, 0], (v.width,),
                              sd["visual.ln_post.weight"], sd["visual.ln_post.bias"])
        pooled = pooled @ sd["visual.proj"]
        want_taps = [outs[0].numpy(), outs[2].numpy()]
    got_pooled, got_taps = encode_image(params["visual"], CFG,
                                        jnp.asarray(images.numpy()), out_layers=[1, 3])
    np.testing.assert_allclose(np.asarray(got_pooled), pooled.numpy(), atol=1e-4)
    for g, w in zip(got_taps, want_taps):
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-4)


@pytest.mark.parametrize("vv_mode", ["batch", "spatial"])
def test_surgery_parity(setup, vv_mode):
    """V-V surgery features: blocks >= vv_start use V-V attention, then
    ln_post over patch tokens and @proj (reference train.py:78-81).

    ``batch`` is the reference-exact quirk semantics (attention across the
    batch at each position — default), ``spatial`` the opt-in per-sample
    form; both are checked against independent torch transcriptions."""
    sd, params, images = setup
    v = CFG.vision
    surgery_until = 3  # replaces last 2 of 3 blocks -> vv_start = 1
    with torch.no_grad():
        outs = _torch_vision_trunk(sd, CFG, images, vv_start=1, vv_mode=vv_mode)
        feats = []
        for t in (outs[1], outs[2]):
            f = F.layer_norm(t[:, 1:], (v.width,),
                             sd["visual.ln_post.weight"], sd["visual.ln_post.bias"])
            feats.append((f @ sd["visual.proj"]).numpy())
    got = surgery_patch_features(params["visual"], CFG, jnp.asarray(images.numpy()),
                                 out_layers=[2, 3], surgery_until_layer=surgery_until,
                                 vv_mode=vv_mode)
    for g, w in zip(got, feats):
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-4)


def test_encode_text_trimmed_padding_matches(setup):
    """Causal attention means trailing pad tokens never influence the EOT
    position: encode_text on tokens trimmed past the EOT must equal the
    padded-to-context-length result (the mask/pos-emb now follow the input
    length instead of crashing on non-77 inputs)."""
    _, params, _ = setup
    text = np.zeros((2, CFG.text.context_length), np.int64)
    text[0, :4] = [99, 5, 7, 98]
    text[1, :3] = [99, 3, 98]
    full = encode_text(params["text"], CFG, jnp.asarray(text))
    trimmed = encode_text(params["text"], CFG, jnp.asarray(text[:, :6]))
    np.testing.assert_allclose(np.asarray(trimmed), np.asarray(full),
                               atol=1e-5, rtol=1e-5)


def test_adapted_forward_rejects_oversized_adapter_stack(setup):
    """More adapters than tower layers would silently train dead weight;
    the trunk must reject it like it rejects bad tap depths."""
    _, params, images = setup
    acfg = AdapterConfig(levels=(1, 2), image_adapt_until=CFG.vision.layers + 2,
                         text_adapt_until=1)
    adapters = init_adapter_params(jax.random.PRNGKey(3), CFG, acfg)
    with pytest.raises(ValueError, match="adapters exceed"):
        adapted_forward(params["visual"], adapters["image"], CFG,
                        jnp.asarray(images.numpy()), levels=(1, 2))


def test_surgery_features_ignore_staging(setup):
    """Staging (bf16_until) is inference-only: stage-1 surgery features are
    training supervision, so surgery_patch_features must produce bitwise
    the SAME features for a staged policy as for its unstaged form — the
    facade path and train/steps.py's stage1_features_fn then agree for any
    precision name (round-3 review finding)."""
    import dataclasses

    from aaclip_tpu.core.config import DtypePolicy

    _, params, images = setup
    base = DtypePolicy.fp32_high()
    staged = dataclasses.replace(base, bf16_until=2)
    kw = dict(out_layers=[2, 3], surgery_until_layer=3, vv_mode="batch")
    ref = surgery_patch_features(params["visual"], CFG,
                                 jnp.asarray(images.numpy()),
                                 policy=base.unstaged(), **kw)
    got = surgery_patch_features(params["visual"], CFG,
                                 jnp.asarray(images.numpy()),
                                 policy=staged, **kw)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_encode_text_parity(setup):
    sd, params, _ = setup
    t = CFG.text
    text = torch.tensor([[99, 5, 7, 98, 0, 0, 0, 0, 0, 0, 0, 0],
                         [99, 3, 98, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    with torch.no_grad():
        x = sd["token_embedding.weight"][text] + sd["positional_embedding"]
        mask = torch.full((t.context_length, t.context_length), float("-inf")).triu(1)
        for i in range(t.layers):
            x = _torch_block(sd, f"transformer.resblocks.{i}", x, t.width, t.heads,
                             attn_mask=mask)
        x = F.layer_norm(x, (t.width,), sd["ln_final.weight"], sd["ln_final.bias"])
        pooled = x[torch.arange(2), text.argmax(-1)] @ sd["text_projection"]
    got = encode_text(params["text"], CFG, jnp.asarray(text.numpy()))
    np.testing.assert_allclose(np.asarray(got), pooled.numpy(), atol=1e-4)


def test_adapted_forwards_run_and_differ(setup):
    """Adapted image/text paths: finite outputs, unit-norm seg tokens, and
    genuinely different from the frozen path."""
    sd, params, images = setup
    acfg = AdapterConfig(levels=(1, 3), image_adapt_until=2, text_adapt_until=1)
    ad = init_adapter_params(jax.random.PRNGKey(0), CFG, acfg)
    seg, det = adapted_forward(params["visual"], ad["image"], CFG,
                               jnp.asarray(images.numpy()),
                               levels=acfg.levels)
    assert len(seg) == 2 and seg[0].shape == (2, 9, 24) and det.shape == (2, 24)
    norms = np.linalg.norm(np.asarray(seg[0]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    text = jnp.asarray([[99, 5, 7, 98, 0, 0, 0, 0, 0, 0, 0, 0]])
    e_frozen = encode_text(params["text"], CFG, text)
    e_adapted = adapted_encode_text(params["text"], ad["text"], CFG, text)
    assert np.abs(np.asarray(e_frozen) - np.asarray(e_adapted)).max() > 1e-3


def test_staged_precision_trunk(setup):
    """policy.bf16_until stages the leading blocks at bf16 matmuls while
    keeping the fp32 residual stream: bf16_until=0 is bitwise the base
    path, a staged prefix stays close to fp32 (bf16 rounding only), and
    the depth clamps at the tower size."""
    import dataclasses

    from aaclip_tpu.core.config import DtypePolicy

    sd, params, images = setup
    acfg = AdapterConfig(levels=(1, 3), image_adapt_until=2, text_adapt_until=1)
    ad = init_adapter_params(jax.random.PRNGKey(0), CFG, acfg)
    imgs = jnp.asarray(images.numpy())
    base = DtypePolicy.fp32()

    def run(policy):
        seg, det = adapted_forward(params["visual"], ad["image"], CFG, imgs,
                                   levels=acfg.levels, policy=policy)
        return np.asarray(jnp.stack(seg)), np.asarray(det)

    seg0, det0 = run(dataclasses.replace(base, bf16_until=0))
    seg_ref, det_ref = run(base)
    np.testing.assert_array_equal(seg0, seg_ref)  # 0 = identical graph

    seg1, det1 = run(dataclasses.replace(base, bf16_until=1))
    assert np.isfinite(seg1).all() and np.isfinite(det1).all()
    # staged prefix deviates by bf16 rounding only — small but nonzero
    np.testing.assert_allclose(seg1, seg_ref, atol=0.05)
    np.testing.assert_allclose(det1, det_ref, atol=0.05)
    assert np.abs(seg1 - seg_ref).max() > 0  # it really staged

    # depth beyond the tower clamps (no crash), staged everywhere
    seg9, det9 = run(dataclasses.replace(base, bf16_until=99))
    assert np.isfinite(seg9).all()
    # training steps neutralize staging
    staged = dataclasses.replace(base, bf16_until=2)
    assert staged.unstaged().bf16_until == 0
    assert staged.prefix_policy().compute_dtype == jnp.bfloat16
    assert staged.prefix_policy().bf16_until == 0


def test_resize_pos_embed_matches_torch_bicubic():
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((1 + 6 * 6, 8)).astype(np.float32)
    grid = torch.from_numpy(pos[1:].reshape(1, 6, 6, 8).transpose(0, 3, 1, 2))
    want = F.interpolate(grid, size=(9, 9), mode="bicubic",
                         antialias=True, align_corners=False)
    want = want.permute(0, 2, 3, 1).reshape(81, 8).numpy()
    got = resize_pos_embed(pos, 9)
    np.testing.assert_allclose(got[0], pos[0], atol=0)
    np.testing.assert_allclose(got[1:], want, atol=1e-5, rtol=1e-5)


def test_resize_pos_embed_downscale_matches_torch():
    """DOWNSCALING parity (24 -> 16 grid, i.e. loading ViT-L-336 weights at
    img_size 224): torch's antialiased bicubic widens the kernel support
    by the scale factor — a fixed 4-tap window silently diverges here
    (round-3 review finding)."""
    rng = np.random.default_rng(2)
    pos = rng.standard_normal((1 + 24 * 24, 16)).astype(np.float32)
    grid = torch.from_numpy(
        pos[1:].reshape(1, 24, 24, 16).transpose(0, 3, 1, 2))
    want = F.interpolate(grid, size=(16, 16), mode="bicubic",
                         antialias=True, align_corners=False)
    want = want.permute(0, 2, 3, 1).reshape(16 * 16, 16).numpy()
    got = resize_pos_embed(pos, 16)
    np.testing.assert_allclose(got[1:], want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("out_size", [9, 4])
def test_bicubic_no_antialias_matches_torch(out_size):
    """The antialias=False flavor (a=-0.75, edge-clamped taps) tracks
    torch in both directions too."""
    from aaclip_tpu.ops.resize import resize_bicubic_2d

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 6, 6)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(out_size, out_size),
                         mode="bicubic", antialias=False,
                         align_corners=False).numpy()
    got = resize_bicubic_2d(x, (out_size, out_size), antialias=False)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_resize_pos_embed_24_to_37_matches_torch():
    """The exact production resize: 24x24 -> 37x37 grid."""
    rng = np.random.default_rng(1)
    pos = rng.standard_normal((1 + 24 * 24, 16)).astype(np.float32)
    grid = torch.from_numpy(pos[1:].reshape(1, 24, 24, 16).permute_dims
                            if False else pos[1:].reshape(1, 24, 24, 16).transpose(0, 3, 1, 2))
    want = F.interpolate(grid, size=(37, 37), mode="bicubic",
                         antialias=True, align_corners=False)
    want = want.permute(0, 2, 3, 1).reshape(37 * 37, 16).numpy()
    got = resize_pos_embed(pos, 37)
    np.testing.assert_allclose(got[1:], want, atol=2e-5, rtol=1e-4)

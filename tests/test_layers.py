"""Parity of transformer primitives against torch reference ops:
LayerNorm, GELU, packed-QKV MultiheadAttention (standard + V-V variant),
and a full pre-LN residual block."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from aaclip_tpu.models import layers as L


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _mha_params(d, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w_qkv": (rng.standard_normal((d, 3 * d)) * d ** -0.5).astype(np.float32),
        "b_qkv": (rng.standard_normal(3 * d) * 0.02).astype(np.float32),
        "w_out": (rng.standard_normal((d, d)) * d ** -0.5).astype(np.float32),
        "b_out": (rng.standard_normal(d) * 0.02).astype(np.float32),
    }


def _torch_mha(p, d, heads):
    m = torch.nn.MultiheadAttention(d, heads, batch_first=True)
    with torch.no_grad():
        m.in_proj_weight.copy_(torch.from_numpy(p["w_qkv"].T))
        m.in_proj_bias.copy_(torch.from_numpy(p["b_qkv"]))
        m.out_proj.weight.copy_(torch.from_numpy(p["w_out"].T))
        m.out_proj.bias.copy_(torch.from_numpy(p["b_out"]))
    return m.eval()


def test_layer_norm_matches_torch():
    x = _rand((2, 5, 16), 0)
    p = {"scale": _rand((16,), 1), "bias": _rand((16,), 2)}
    want = F.layer_norm(torch.from_numpy(x), (16,),
                        torch.from_numpy(p["scale"]),
                        torch.from_numpy(p["bias"])).numpy()
    got = np.asarray(L.layer_norm(jnp.asarray(x),
                                  {k: jnp.asarray(v) for k, v in p.items()}))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gelu_matches_torch_exact():
    x = _rand((64,), 3)
    want = F.gelu(torch.from_numpy(x)).numpy()
    got = np.asarray(L.gelu(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_leaky_relu_matches_torch():
    x = _rand((64,), 4)
    want = F.leaky_relu(torch.from_numpy(x)).numpy()
    got = np.asarray(L.leaky_relu(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_attention_matches_torch_mha():
    d, heads = 32, 4
    p = _mha_params(d)
    x = _rand((2, 9, d), 5)
    m = _torch_mha(p, d, heads)
    with torch.no_grad():
        want = m(torch.from_numpy(x), torch.from_numpy(x),
                 torch.from_numpy(x), need_weights=False)[0].numpy()
    got = np.asarray(L.attention(jnp.asarray(x),
                                 {k: jnp.asarray(v) for k, v in p.items()}, heads))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_attention_causal_mask_matches_torch():
    d, heads, n = 16, 2, 7
    p = _mha_params(d, seed=6)
    x = _rand((3, n, d), 7)
    m = _torch_mha(p, d, heads)
    tm = torch.full((n, n), float("-inf")).triu(1)
    with torch.no_grad():
        want = m(torch.from_numpy(x), torch.from_numpy(x),
                 torch.from_numpy(x), attn_mask=tm, need_weights=False)[0].numpy()
    got = np.asarray(L.attention(jnp.asarray(x),
                                 {k: jnp.asarray(v) for k, v in p.items()},
                                 heads, mask=L.causal_mask(n)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_residual_block_rejects_mask_with_attn_fn():
    """Every attn_fn override in the repo is unmasked; a masked tower
    reaching one must fail loudly, not silently attend unmasked."""
    d, heads, n = 16, 2, 5
    p = {"ln_1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
         "ln_2": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
         "attn": {k: jnp.asarray(v) for k, v in _mha_params(d, seed=3).items()},
         "mlp": {"w_fc": jnp.zeros((d, 4 * d)), "b_fc": jnp.zeros(4 * d),
                 "w_proj": jnp.zeros((4 * d, d)), "b_proj": jnp.zeros(d)}}
    x = jnp.asarray(_rand((1, n, d), 4))
    with pytest.raises(ValueError, match="unmasked"):
        L.residual_block(x, p, heads, mask=L.causal_mask(n),
                         attn_fn=lambda h, ap: h)


def test_vv_attention_matches_manual():
    """V-V variant: q=k=v, same scaling/projection (reference
    model/transformer.py:139-152)."""
    d, heads, n = 16, 4, 6
    p = _mha_params(d, seed=8)
    x = _rand((2, n, d), 9)
    xt = torch.from_numpy(x)
    w = torch.from_numpy(p["w_qkv"])  # [d, 3d]
    b = torch.from_numpy(p["b_qkv"])
    qkv = xt @ w + b
    v = qkv[..., 2 * d:].reshape(2, n, heads, d // heads).permute(0, 2, 1, 3)
    scale = (d // heads) ** -0.5
    attn = ((v @ v.transpose(-2, -1)) * scale).softmax(-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(2, n, d)
    want = (out @ torch.from_numpy(p["w_out"]) + torch.from_numpy(p["b_out"])).numpy()
    got = np.asarray(L.attention(jnp.asarray(x),
                                 {k: jnp.asarray(v2) for k, v2 in p.items()},
                                 heads, vv=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_vv_batch_attention_degenerates_at_batch_one():
    """The reference layout quirk's documented degenerate case
    (docs/PARITY.md): with a batch of one, the per-position softmax is
    over a single sample, so batch-coupled V-V attention reduces exactly
    to proj(v) — the 'attention' does nothing."""
    d, heads, n = 16, 4, 6
    p = _mha_params(d, seed=10)
    x = _rand((1, n, d), 11)
    pj = {k: jnp.asarray(v) for k, v in p.items()}
    got = np.asarray(L.attention_vv_batch(jnp.asarray(x), pj, heads))
    v = x @ p["w_qkv"][:, 2 * d:] + p["b_qkv"][2 * d:]
    want = v @ p["w_out"] + p["b_out"]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # and with two samples it no longer does (the coupling is real)
    x2 = _rand((2, n, d), 12)
    got2 = np.asarray(L.attention_vv_batch(jnp.asarray(x2), pj, heads))
    v2 = x2 @ p["w_qkv"][:, 2 * d:] + p["b_qkv"][2 * d:]
    want2 = v2 @ p["w_out"] + p["b_out"]
    assert np.abs(got2 - want2).max() > 1e-3


def test_residual_block_matches_torch():
    d, heads, n = 32, 4, 5
    rng = np.random.default_rng(10)
    p = {
        "ln_1": {"scale": _rand((d,), 11) * 0.1 + 1, "bias": _rand((d,), 12) * 0.1},
        "attn": _mha_params(d, seed=13),
        "ln_2": {"scale": _rand((d,), 14) * 0.1 + 1, "bias": _rand((d,), 15) * 0.1},
        "mlp": {
            "w_fc": (rng.standard_normal((d, 4 * d)) * d ** -0.5).astype(np.float32),
            "b_fc": _rand((4 * d,), 16) * 0.02,
            "w_proj": (rng.standard_normal((4 * d, d)) * d ** -0.5).astype(np.float32),
            "b_proj": _rand((d,), 17) * 0.02,
        },
    }
    x = _rand((2, n, d), 18)
    xt = torch.from_numpy(x)
    m = _torch_mha(p["attn"], d, heads)
    with torch.no_grad():
        h = F.layer_norm(xt, (d,), torch.from_numpy(p["ln_1"]["scale"]),
                         torch.from_numpy(p["ln_1"]["bias"]))
        a = m(h, h, h, need_weights=False)[0]
        y = xt + a
        h2 = F.layer_norm(y, (d,), torch.from_numpy(p["ln_2"]["scale"]),
                          torch.from_numpy(p["ln_2"]["bias"]))
        mlp = F.gelu(h2 @ torch.from_numpy(p["mlp"]["w_fc"])
                     + torch.from_numpy(p["mlp"]["b_fc"]))
        mlp = mlp @ torch.from_numpy(p["mlp"]["w_proj"]) + torch.from_numpy(p["mlp"]["b_proj"])
        want = (y + mlp).numpy()
    jp = {
        "ln_1": {k: jnp.asarray(v) for k, v in p["ln_1"].items()},
        "attn": {k: jnp.asarray(v) for k, v in p["attn"].items()},
        "ln_2": {k: jnp.asarray(v) for k, v in p["ln_2"].items()},
        "mlp": {k: jnp.asarray(v) for k, v in p["mlp"].items()},
    }
    got = np.asarray(L.residual_block(jnp.asarray(x), jp, heads))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_norm_matched_blend():
    x = _rand((2, 4, 8), 20)
    a = _rand((2, 4, 8), 21)
    xn = np.linalg.norm(x, axis=-1, keepdims=True)
    an = np.linalg.norm(a, axis=-1, keepdims=True)
    want = 0.1 * (a * xn / an) + 0.9 * x
    got = np.asarray(L.norm_matched_blend(jnp.asarray(x), jnp.asarray(a), 0.1))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_norm_matched_blend_zero_adapter_no_nan():
    """An exactly-zero adapter output must not NaN the stream via 0 * inf
    (the pipeline-bubble NaN class, guarded at the primitive)."""
    x = _rand((2, 4, 8), 22)
    zero = np.zeros_like(x)
    got = np.asarray(L.norm_matched_blend(jnp.asarray(x), jnp.asarray(zero),
                                          0.1))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, 0.9 * x, atol=1e-6)


def test_quick_gelu_config_wiring():
    """A config with quick_gelu=True must actually run QuickGELU
    (reference model/model.py:84 selects the act class from the config) —
    encode_text output must diverge from the erf-GELU path, and
    config_act must pick the right function per config/policy."""
    import dataclasses

    from aaclip_tpu.core.config import DtypePolicy, get_config
    from aaclip_tpu.core.params import create_clip_params
    from aaclip_tpu.models.text_model import encode_text

    cfg = get_config("tiny-test")
    cfg_qg = dataclasses.replace(cfg, quick_gelu=True)

    assert L.config_act(cfg, DtypePolicy.fp32()) is L.gelu
    assert L.config_act(cfg, DtypePolicy.bf16()) is L.gelu_tanh
    assert L.config_act(cfg_qg, DtypePolicy.fp32()) is L.quick_gelu
    assert L.config_act(cfg_qg, DtypePolicy.bf16()) is L.quick_gelu

    clip = create_clip_params(cfg, seed=0)
    tokens = jnp.array([[49406, 320, 1125, 49407] + [0] * 73])
    out_erf = np.asarray(encode_text(clip["text"], cfg, tokens))
    out_qg = np.asarray(encode_text(clip["text"], cfg_qg, tokens))
    assert np.abs(out_erf - out_qg).max() > 1e-4

    # QuickGELU numerics match the reference formula x * sigmoid(1.702 x)
    import torch
    x = _rand((64,), 5)
    want = (torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(np.asarray(L.quick_gelu(jnp.asarray(x))), want,
                               atol=1e-6)

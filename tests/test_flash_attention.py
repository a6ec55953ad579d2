"""Pallas attention kernel vs the reference jnp attention (interpret mode
on CPU; the same code compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aaclip_tpu.models import layers as L
from aaclip_tpu.ops.flash_attention import attention_kernel, make_attn_fn


def _qkv(b, h, s, d, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
                 for _ in range(3))


@pytest.mark.parametrize("s", [128, 250, 260])
def test_kernel_matches_reference_softmax_attention(s):
    b, h, d = 2, 3, 64
    q, k, v = _qkv(b, h, s, d, seed=s)
    scale = d ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
    got = attention_kernel(q, k, v, valid_len=s, q_blk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_padding_mask_ignores_tail_keys():
    """With valid_len < S, results must equal attention over the first
    valid_len keys only."""
    b, h, s, d = 1, 2, 256, 64
    q, k, v = _qkv(b, h, s, d, seed=1)
    valid = 250
    got = attention_kernel(q, k, v, valid_len=valid, q_blk=128,
                           interpret=True)[:, :, :valid]
    qs, ks, vs = q[:, :, :valid], k[:, :, :valid], v[:, :, :valid]
    scores = jnp.einsum("bhqd,bhkd->bhqk", qs, ks) * d ** -0.5
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_attn_fn_matches_layers_attention():
    d, heads, n = 64, 2, 100
    rng = np.random.default_rng(2)
    p = {
        "w_qkv": jnp.asarray(rng.standard_normal((d, 3 * d)) * d ** -0.5, jnp.float32),
        "b_qkv": jnp.asarray(rng.standard_normal(3 * d) * 0.02, jnp.float32),
        "w_out": jnp.asarray(rng.standard_normal((d, d)) * d ** -0.5, jnp.float32),
        "b_out": jnp.asarray(rng.standard_normal(d) * 0.02, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((2, n, d)), jnp.float32)
    want = L.attention(x, p, heads)
    fn = make_attn_fn(heads, q_blk=128, interpret=True)
    got = fn(x, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    # V-V variant
    want_vv = L.attention(x, p, heads, vv=True)
    fn_vv = make_attn_fn(heads, vv=True, q_blk=128, interpret=True)
    got_vv = fn_vv(x, p)
    np.testing.assert_allclose(np.asarray(got_vv), np.asarray(want_vv),
                               atol=2e-5, rtol=1e-4)


def test_attn_fn_multiple_q_blocks():
    """q_blk < S_pad exercises the blocked-query path for BOTH variants
    (a V-V bug once hid behind single-block shapes)."""
    d, heads, n = 64, 2, 250  # S_pad 256, q_blk 64 -> 4 q blocks
    rng = np.random.default_rng(5)
    p = {
        "w_qkv": jnp.asarray(rng.standard_normal((d, 3 * d)) * d ** -0.5, jnp.float32),
        "b_qkv": jnp.asarray(rng.standard_normal(3 * d) * 0.02, jnp.float32),
        "w_out": jnp.asarray(rng.standard_normal((d, d)) * d ** -0.5, jnp.float32),
        "b_out": jnp.asarray(rng.standard_normal(d) * 0.02, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((2, n, d)), jnp.float32)
    for vv in (False, True):
        want = L.attention(x, p, heads, vv=vv)
        fn = make_attn_fn(heads, vv=vv, q_blk=64, interpret=True)
        got = fn(x, p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4, err_msg=f"vv={vv}")


def test_fp32_kernel_precision_modes():
    """fp32 inputs through the packed kernel at the two parity precisions
    (interpret mode: the manual 3-pass bf16 split's quantization is real on
    CPU, so its error shows here).  'highest' must track exact fp32
    attention tightly; 'high' within the fast-parity band."""
    from aaclip_tpu.ops.flash_attention import attention_packed

    d, heads, n = 128, 2, 200
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((2, n, 3 * d)), jnp.float32)
    q, k, v = np.split(np.asarray(qkv), 3, axis=-1)
    hd = d // heads
    qh = q.reshape(2, n, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(2, n, heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(2, n, heads, hd).transpose(0, 2, 1, 3)
    s = np.einsum("bhqd,bhkd->bhqk", qh, kh) * hd ** -0.5
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, vh).transpose(0, 2, 1, 3).reshape(2, n, d)

    got_hi = np.asarray(attention_packed(qkv, heads, n, q_blk=128,
                                         precision="highest", interpret=True))
    np.testing.assert_allclose(got_hi, want, atol=2e-6)
    got_h = np.asarray(attention_packed(qkv, heads, n, q_blk=128,
                                        precision="high", interpret=True))
    np.testing.assert_allclose(got_h, want, atol=1e-4)
    # the 3-pass split really quantized (it is not silently exact fp32)
    assert np.abs(got_h - want).max() > 1e-7


def test_fp32_high_policy_table():
    from aaclip_tpu.core.config import DtypePolicy

    p = DtypePolicy.from_name("fp32_high")
    assert p.precision == "high" and p.compute_dtype == jnp.float32
    assert not p.fast_act  # erf GELU: fp32_high stays a parity-family path
    assert p.bf16_until == 6  # round-3 staged trunk (inference path)
    assert p.unstaged().bf16_until == 0 and p.unstaged().precision == "high"
    assert DtypePolicy.from_name("fp32").precision == "highest"
    assert DtypePolicy.from_name("fp32").bf16_until == 0  # parity untouched
    assert DtypePolicy.from_name("bf16").bf16_until == 0
    assert DtypePolicy.from_name("bf16").compute_dtype == jnp.bfloat16
    import pytest as _pytest
    with _pytest.raises(ValueError):
        DtypePolicy.from_name("fp64")


def test_make_attn_fn_rejects_vv_differentiable():
    """No V-V custom VJP exists (stage-1 features are gradient-free);
    silently dropping the flag would leave a non-differentiable
    pallas_call in a training graph (round-3 review finding)."""
    with pytest.raises(ValueError, match="no differentiable"):
        make_attn_fn(4, vv=True, differentiable=True)


def test_pallas_attention_supported_geometry_gate():
    """maybe_make_attn_fn must refuse head geometries whose packed feature
    sections cannot tile the 128-lane registers (e.g. tiny-test's
    head_dim 16), and accept the production ViT-L/-B geometries."""
    from aaclip_tpu.ops.flash_attention import (
        maybe_make_attn_fn, pallas_attention_supported)

    assert pallas_attention_supported(16, 64)      # ViT-L: 2 heads x 64
    assert pallas_attention_supported(12, 64)      # ViT-B
    assert pallas_attention_supported(1, 128)      # single wide head
    assert not pallas_attention_supported(2, 16)   # tiny-test
    assert not pallas_attention_supported(3, 64)   # odd heads, 64 lanes

    from aaclip_tpu.core.config import get_config
    # on the CPU test backend the gate must always return None
    assert maybe_make_attn_fn(get_config("tiny-test")) is None

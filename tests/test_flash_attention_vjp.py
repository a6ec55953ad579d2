"""Custom-VJP packed attention: gradients match jax.grad through the
reference jnp attention (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from aaclip_tpu.ops.flash_attention import attention_packed_diff


def _reference_packed(qkv, num_heads, valid_len):
    B, S, three_dm = qkv.shape
    dm = three_dm // 3
    hd = dm // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(x):
        return x.reshape(B, S, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * hd ** -0.5
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(B, S, dm)


def test_forward_matches_reference():
    B, S, H, hd = 2, 100, 4, 16
    dm = H * hd
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, S, 3 * dm)), jnp.float32)
    got = attention_packed_diff(qkv, H, S, 128, None, True)
    want = _reference_packed(qkv, H, S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_gradient_matches_reference():
    B, S, H, hd = 1, 96, 2, 16
    dm = H * hd
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.standard_normal((B, S, 3 * dm)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((B, S, dm)), jnp.float32)

    def loss_kernel(x):
        return jnp.sum(attention_packed_diff(x, H, S, 96, None, True) * cot)

    def loss_ref(x):
        return jnp.sum(_reference_packed(x, H, S) * cot)

    g_kernel = jax.grad(loss_kernel)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               atol=3e-4, rtol=1e-3)


def test_gradient_with_padding():
    """S not a multiple of q_blk: padded keys/queries must not leak
    gradient."""
    B, S, H, hd = 1, 70, 2, 16
    dm = H * hd
    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.standard_normal((B, S, 3 * dm)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((B, S, dm)), jnp.float32)
    g_kernel = jax.grad(
        lambda x: jnp.sum(attention_packed_diff(x, H, S, 64, None, True) * cot))(qkv)
    g_ref = jax.grad(
        lambda x: jnp.sum(_reference_packed(x, H, S) * cot))(qkv)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               atol=3e-4, rtol=1e-3)

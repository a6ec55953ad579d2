"""Fused residual-block kernels (ops/fused_block.py) vs the jnp block.

Runs the Pallas kernels in interpret mode on CPU.  fp32 must match the
jnp path tightly (same op order up to fp32 accumulation); bf16 within
bf16 rounding of the same computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aaclip_tpu.core.config import DtypePolicy
from aaclip_tpu.models import layers as L
from aaclip_tpu.ops import fused_block as FB

D, F, HEADS = 128, 512, 2
B, S = 2, 21  # odd S exercises row padding


def _rng_tree(key, shapes):
    out = {}
    for name, shape in shapes.items():
        key, k = jax.random.split(key)
        out[name] = jax.random.normal(k, shape, jnp.float32) * 0.05
    return out


def _block_params(key):
    key, k1, k2 = jax.random.split(key, 3)
    return {
        "ln_1": {"scale": jnp.ones((D,)) + 0.1 * jax.random.normal(k1, (D,)),
                 "bias": 0.1 * jax.random.normal(k2, (D,))},
        "ln_2": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "attn": _rng_tree(key, {"w_qkv": (D, 3 * D), "b_qkv": (3 * D,),
                                "w_out": (D, D), "b_out": (D,)}),
        "mlp": _rng_tree(jax.random.fold_in(key, 7),
                         {"w_fc": (D, F), "b_fc": (F,),
                          "w_proj": (F, D), "b_proj": (D,)}),
    }


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, S, D), jnp.float32)
    return x, _block_params(key)


def _policies():
    return [("fp32", DtypePolicy.fp32(), 2e-5),
            ("bf16", DtypePolicy.bf16(), 4e-2)]


@pytest.mark.parametrize("name,policy,tol", _policies())
def test_ln_linear(data, name, policy, tol):
    x, p = data
    xc = x.astype(policy.compute_dtype)
    ref = L.linear(L.layer_norm(xc, p["ln_1"]),
                   {"w": p["attn"]["w_qkv"], "b": p["attn"]["b_qkv"]}, policy)
    got = FB.ln_linear(xc, p["ln_1"], p["attn"]["w_qkv"], p["attn"]["b_qkv"],
                       policy=policy, r_blk=16, f_blk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32).astype(
                                   np.asarray(got).dtype).astype(np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("name,policy,tol", _policies())
def test_linear_residual(data, name, policy, tol):
    x, p = data
    xc = x.astype(policy.compute_dtype)
    y = (0.3 * x[..., :D]).astype(policy.compute_dtype)
    ref = xc + L.linear(y, {"w": p["attn"]["w_out"],
                            "b": p["attn"]["b_out"]}, policy).astype(xc.dtype)
    got = FB.linear_residual(xc, y, p["attn"]["w_out"], p["attn"]["b_out"],
                             policy=policy, r_blk=16, f_blk=128,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=tol, atol=tol)


@pytest.mark.parametrize("name,policy,tol", _policies())
def test_mlp_fused(data, name, policy, tol):
    x, p = data
    xc = x.astype(policy.compute_dtype)
    act = L.policy_act(policy)
    ref = xc + L.mlp(L.layer_norm(xc, p["ln_2"]), p["mlp"], act, policy)
    got = FB.mlp_fused(xc, p["ln_2"], p["mlp"], act=act, policy=policy,
                       r_blk=16, f_blk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=tol, atol=tol)


@pytest.mark.parametrize("vv", [False, True])
@pytest.mark.parametrize("name,policy,tol", _policies())
def test_block_fn_matches_residual_block(data, vv, name, policy, tol):
    x, p = data
    xc = x.astype(policy.compute_dtype)
    act = L.policy_act(policy)
    ref = L.residual_block(xc, p, HEADS, vv=vv, act=act, policy=policy)
    fn = FB.make_block_fn(HEADS, policy, act=act, vv=vv, r_blk=16,
                          mlp_f_blk=128, interpret=True)
    got = fn(xc, p)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=tol,
                               atol=2 * tol)


def test_supported_gate():
    from aaclip_tpu.core.config import get_config

    cfg = get_config("ViT-L-14-336")
    assert FB.fused_block_supported(cfg)
    # CPU backend -> gate must return None regardless of geometry
    assert FB.maybe_make_block_fn(cfg, DtypePolicy.bf16()) is None


def test_encode_image_with_block_fn(data):
    """End-to-end trunk equivalence: fused block_fn vs default path."""
    from aaclip_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
    from aaclip_tpu.core.params import init_clip_params
    from aaclip_tpu.models import vit

    cfg = CLIPConfig(
        embed_dim=64,
        vision=VisionConfig(image_size=28, native_image_size=28, layers=3,
                            width=D, heads=HEADS, patch_size=14,
                            output_dim=64),
        text=TextConfig(context_length=8, vocab_size=32, width=64, heads=2,
                        layers=1, output_dim=64),
    )
    params = init_clip_params(jax.random.PRNGKey(3), cfg,
                              DtypePolicy.fp32())["visual"]
    policy = DtypePolicy.fp32()
    imgs = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 28, 28),
                             jnp.float32)
    pooled_ref, taps_ref = vit.encode_image(params, cfg, imgs, (2, 3),
                                            policy=policy)
    fn = FB.make_block_fn(HEADS, policy, act=L.gelu, r_blk=8, mlp_f_blk=128,
                          interpret=True)
    vfn = FB.make_block_fn(HEADS, policy, act=L.gelu, vv=True, r_blk=8,
                           mlp_f_blk=128, interpret=True)
    pooled, taps = vit.encode_image(params, cfg, imgs, (2, 3), policy=policy,
                                    block_fn=fn, vv_block_fn=vfn)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref),
                               rtol=3e-5, atol=3e-5)
    for t, tr in zip(taps, taps_ref):
        np.testing.assert_allclose(np.asarray(t), np.asarray(tr),
                                   rtol=3e-5, atol=3e-5)

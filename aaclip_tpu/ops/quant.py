"""Int8 quantized inference matmuls (``--precision int8``).

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate, and the
non-attention trunk is measured compute-bound at 70-87% of bf16 peak
(docs/PERFORMANCE.md), so quantizing the big frozen matmuls buys real
throughput (measured: the full MLP with dynamic activation quantization
runs 1.22x its bf16 form at production shapes; model-level numbers in
docs/PERFORMANCE.md "int8").

Scheme — the standard w8a8 dynamic recipe:

* **Weights**: symmetric per-output-channel int8 at load time
  (``quantize_block_weights``).  Only the trunk's big matmuls are
  quantized — packed QKV, attention out-projection, both MLP weights
  (~95% of trunk matmul FLOPs).  The patch embedding, LayerNorms,
  adapters, and the seg/det heads that feed the 100x similarity scores
  stay in the policy dtype: they are cheap and accuracy-critical.
* **Activations**: symmetric per-token int8 computed on the fly
  (``dyn_quant`` — one abs-max reduce per row).  No calibration data
  needed; the scale is exact for each token.
* **Dequant**: the int32 accumulator is scaled by the rank-1 outer
  product of the two scale vectors — exact, fused by XLA into the
  matmul epilogue.

This is an INFERENCE-ONLY opt-in quality/speed trade (rounding noise is
~0.4% per matmul): the reference has no quantized path, training always
uses the float families, and the task-level quality gate mirrors the
bf16 fast path's (tests/test_fast_path_quality.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array):
    """Symmetric per-output-channel int8: ``[..., in, out]`` float ->
    ``(int8 [..., in, out], float32 scales [..., out])`` with
    ``w ~= q * s``."""
    a = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(a), axis=-2), 1e-12) / 127.0
    q = jnp.clip(jnp.round(a / s[..., None, :]), -127, 127).astype(jnp.int8)
    return q, s


def dyn_quant(x: jax.Array):
    """Symmetric per-token int8: ``[..., K]`` float ->
    ``(int8, float32 per-row scale [..., 1])`` with ``x ~= q * m``."""
    a = x.astype(jnp.float32)
    m = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(a / m), -127, 127).astype(jnp.int8)
    return q, m


def qdot(x: jax.Array, w_q: jax.Array, w_s: jax.Array) -> jax.Array:
    """``x @ (w_q * w_s)`` via an int8 MXU matmul with int32 accumulation;
    returns float32."""
    q, m = dyn_quant(x)
    y = jnp.dot(q, w_q, preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (m * w_s)


_QUANT_KEYS = {
    "attn": ("w_qkv", "w_out"),
    "mlp": ("w_fc", "w_proj"),
}


def quantize_block_weights(blocks: dict, source: dict | None = None) -> dict:
    """Quantize the stacked trunk blocks' big matmul weights in place of
    their float leaves, adding ``<name>_s`` scale leaves next to each.

    The stacked layout ([L, in, out] leaves) quantizes per (layer,
    out-channel); ``lax.scan`` slicing carries the scale rows alongside
    the weights automatically.  Biases, LayerNorms, and everything else
    are untouched.

    ``source`` (optional) supplies the leaves to quantize FROM while
    ``blocks`` provides everything else: pass the original full-precision
    tree when ``blocks`` has already been cast to a bf16 compute dtype,
    so the int8 grid is fit to the fp32 values instead of double-rounding
    through bf16's 8-bit mantissa first.
    """
    out = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in blocks.items()}
    for group, names in _QUANT_KEYS.items():
        for name in names:
            q, s = quantize_weight((source or out)[group][name])
            out[group][name] = q
            out[group][name + "_s"] = s
    return out

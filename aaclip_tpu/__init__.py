"""aaclip_tpu — a TPU-native (JAX/XLA/Pallas) anomaly-detection framework.

Re-implements the capabilities of AA-CLIP ("Enhancing Zero-shot Anomaly
Detection via Anomaly-Aware CLIP", CVPR 2025) as an idiomatic JAX framework:

* frozen OpenCLIP ViT-L/14-336 towers as pure pytrees (``models/``),
* trainable residual adapters blended functionally (``models/adapters.py``),
* a fused anomaly-map path (similarity matmul -> Gaussian blur -> bilinear
  upsample folded into two small matmuls, ``ops/similarity.py``),
* two-stage adapter training with optax + data-parallel sharding
  (``train/``, ``parallel/``),
* an evaluation/metrics stack with AUROC/AP/AUPRO (``eval/``).

The public CLI surface (train.py / test.py at the repo root) matches the
reference's flag names and defaults.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience re-exports (avoid importing jax at package import)."""
    if name in ("CLIPModel", "AdaptedCLIP"):
        from aaclip_tpu.models import clip as _clip
        return getattr(_clip, name)
    if name in ("get_config", "AdapterConfig", "DtypePolicy"):
        from aaclip_tpu.core import config as _config
        return getattr(_config, name)
    if name in ("create_clip_params", "init_adapter_params"):
        from aaclip_tpu.core import params as _params
        return getattr(_params, name)
    if name == "tokenize":
        from aaclip_tpu.text.bpe import tokenize as _tokenize
        return _tokenize
    raise AttributeError(f"module 'aaclip_tpu' has no attribute {name!r}")

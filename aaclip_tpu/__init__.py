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

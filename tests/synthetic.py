"""Shim: the synthetic dataset generator is a library feature now
(aaclip_tpu/data/synthetic.py) so examples and user smoke tests can use
it; tests keep importing it from here."""

from aaclip_tpu.data.synthetic import make_synthetic_dataset  # noqa: F401

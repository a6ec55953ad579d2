"""Back-compat shim: the int8-vs-bf16 task-metric A/B now lives in
tools/precision_ab.py (generalized to any precision pair, parameterized
dataset scale, and per-image rank correlation).  This entry keeps the
round-3 command `python tools/int8_ab.py ...` working with its original
defaults (baseline bf16, candidate int8, 8+8 images/class — the shape the
round-3 PERFORMANCE.md numbers were captured at)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import precision_ab  # noqa: E402


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # the round-3 harness built 8+8 images/class; keep that default here
    if "--n_normal" not in argv:
        argv += ["--n_normal", "8"]
    if "--n_anomalous" not in argv:
        argv += ["--n_anomalous", "8"]
    precision_ab.main(argv)


if __name__ == "__main__":
    main()

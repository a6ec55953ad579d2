"""Determinism helpers (reference utils.py:10-20 analogue).

JAX programs are deterministic given fixed PRNG keys; the remaining
nondeterminism lives host-side (python/numpy RNG used by the data
pipeline's fallbacks and any ad-hoc sampling)."""

from __future__ import annotations

import os
import random

import numpy as np


def setup_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)

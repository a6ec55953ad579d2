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
    # CPython reads PYTHONHASHSEED only at interpreter startup, so this
    # affects CHILD processes only (e.g. re-exec'd workers) — in-process
    # str/bytes hash order is already fixed for this run
    os.environ["PYTHONHASHSEED"] = str(seed)

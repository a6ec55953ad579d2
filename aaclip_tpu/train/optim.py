"""Optimizers and LR schedules (reference train.py:263-274):

* Adam with betas (0.5, 0.999), default eps 1e-8, no weight decay;
* stage 2 uses MultiStepLR(milestones=[16000, 32000], gamma=0.5) stepped
  per iteration; stage 1 runs at a constant LR.
"""

from __future__ import annotations

from typing import Sequence

import optax


def multistep_schedule(base_lr: float, milestones: Sequence[int] = (16000, 32000),
                       gamma: float = 0.5) -> optax.Schedule:
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_text_optimizer(lr: float = 1e-5) -> optax.GradientTransformation:
    return optax.adam(lr, b1=0.5, b2=0.999)


def make_image_optimizer(lr: float = 5e-4,
                         milestones: Sequence[int] = (16000, 32000),
                         gamma: float = 0.5) -> optax.GradientTransformation:
    return optax.adam(multistep_schedule(lr, milestones, gamma), b1=0.5, b2=0.999)

"""Optimizer / LR schedule (reference configure_optimizers, e.g.
models/fno_1d.py:144-152): torch Adam (L2 weight decay coupled into the
gradient, betas 0.9/0.999, eps 1e-8) + StepLR stepped per epoch
(lr * gamma^(epoch // step_size))."""
from __future__ import annotations

import optax


def make_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    factor: float = 0.3,
    step_size: int = 50,
    steps_per_epoch: int = 1,
):
    """Returns an optax GradientTransformation matching torch
    Adam + StepLR(step_size, gamma=factor) with epoch-granular decay."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * (factor ** (epoch // step_size))

    tx = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    tx += [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    ]
    return optax.chain(*tx)

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
    skip_nonfinite: bool = False,
):
    """Returns an optax GradientTransformation matching torch
    Adam + StepLR(step_size, gamma=factor) with epoch-granular decay.

    ``skip_nonfinite`` wraps the chain in ``optax.apply_if_finite``: an
    update whose grads contain inf/nan is dropped (params and optimizer
    state untouched) instead of poisoning the run — a recovery behavior
    the reference lacks (a single bad step there NaNs the weights for
    good).  Off by default for exact reference-parity semantics."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * (factor ** (epoch // step_size))

    tx = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    tx += [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    ]
    chain = optax.chain(*tx)
    if skip_nonfinite:
        chain = optax.apply_if_finite(chain, max_consecutive_errors=100)
    return chain

"""Noam learning-rate schedule + Adam, as one optax chain.

Equivalent of the reference's ``NoamOpt`` wrapper
(``modules/opt_model.py:1-31`` with the instantiation
``NoamOpt(Adam(lr=0, betas=(0.9, 0.98), eps=1e-9), 2, d_model, w_steps)``
at ``train.py:147``): lr(n) = lr_mul * d_model^-0.5 * min(n^-0.5,
n * warmup^-1.5), stepped before each update so n starts at 1.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(d_model: int, warmup_steps: int, lr_mul: float = 2.0):
    def schedule(count):
        n = count + 1.0  # reference increments before computing (:37)
        scale = d_model ** -0.5 * jnp.minimum(
            n ** -0.5, n * warmup_steps ** -1.5
        )
        return lr_mul * scale

    return schedule


def noam_adam(
    d_model: int, warmup_steps: int = 4000, lr_mul: float = 2.0,
    clip_grad_norm: float = 0.0, nonfinite_guard: str = "off",
) -> optax.GradientTransformation:
    """``clip_grad_norm > 0`` chains global-norm clipping before Adam —
    an opt-in divergence mitigation (the reference clips nothing; default
    0.0 preserves its semantics; see RESULTS.md seed-stability table).

    ``nonfinite_guard="skip"`` wraps the chain in
    ``optax.apply_if_finite``: a step whose gradients contain NaN/inf is
    dropped (params and optimizer state untouched) instead of poisoning
    the run; after 10 consecutive bad steps the updates propagate so a
    systematically-broken run still fails visibly.  The trainer's
    ``"raise"`` mode is implemented step-wise in ``train.trainer``, not
    here."""
    adam = optax.adam(
        learning_rate=noam_schedule(d_model, warmup_steps, lr_mul),
        b1=0.9,
        b2=0.98,
        eps=1e-9,
    )
    tx = adam
    if clip_grad_norm and clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), adam)
    if nonfinite_guard == "skip":
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10)
    return tx

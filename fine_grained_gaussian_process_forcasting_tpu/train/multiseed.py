"""Vmapped multi-seed training: N independent replicas in one dispatch.

The reference's protocol trains 3 random seeds sequentially
(``train.py:266-280``, ``run.sh:1-7``).  On TPU, the per-seed models at
this family's dims (d_model 16-32) underfill the chip, so training the
seeds *as a leading vmap axis* multiplies arithmetic intensity for free:
every GEMM becomes an N-batched GEMM over the same data.

Semantics: each replica has its own params, optimizer state, and PRNG
stream — results are bit-comparable to N sequential ``Trainer`` runs with
the same per-seed keys (pinned by ``tests/test_multiseed.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fine_grained_gaussian_process_forcasting_tpu.train.schedule import noam_adam


@dataclasses.dataclass
class MultiSeedState:
    params: Any  # leading axis = seed
    opt_state: Any
    rngs: jax.Array  # (n_seeds, 2)
    step: int = 0


class MultiSeedTrainer:
    """N-replica version of ``train.Trainer`` (same model.apply contract)."""

    def __init__(self, model, d_model: int, n_seeds: int,
                 warmup_steps: int = 4000, lr_mul: float = 2.0,
                 clip_grad_norm: float = 0.0, nonfinite_guard: str = "off"):
        """``nonfinite_guard`` as in ``train.Trainer``; 'raise' checks at
        epoch granularity here (per-seed step indices would vary across
        the vmap axis), 'skip' drops bad updates per seed independently
        via the vmapped ``optax.apply_if_finite`` state."""
        if nonfinite_guard not in ("off", "raise", "skip"):
            raise ValueError(f"nonfinite_guard={nonfinite_guard!r}")
        self.model = model
        self.n_seeds = n_seeds
        self.nonfinite_guard = nonfinite_guard
        self.optimizer = noam_adam(d_model, warmup_steps, lr_mul,
                                   clip_grad_norm=clip_grad_norm,
                                   nonfinite_guard=nonfinite_guard)
        self._build()

    def _build(self):
        model, optimizer = self.model, self.optimizer

        def loss_fn(params, rngs, enc, dec, y):
            out = model.apply({"params": params}, enc, dec, y, training=True,
                              rngs=rngs)
            return out.loss, out.mse

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def one_seed_step(params, opt_state, rng, enc, dec, y):
            rng, r1, r2 = jax.random.split(rng, 3)
            (loss, mse), grads = grad_fn(
                params, {"noise": r1, "sampling": r2}, enc, dec, y)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, rng,
                    loss, mse)

        # vmap over the seed axis; data shared (in_axes None)
        v_step = jax.vmap(one_seed_step,
                          in_axes=(0, 0, 0, None, None, None))

        def train_epoch(params, opt_state, rngs, enc, dec, y):
            def body(carry, batch):
                p, s, r = carry
                enc_b, dec_b, y_b = batch
                p, s, r, loss, mse = v_step(p, s, r, enc_b, dec_b, y_b)
                return (p, s, r), (loss, mse)

            (params, opt_state, rngs), (losses, mses) = jax.lax.scan(
                body, (params, opt_state, rngs), (enc, dec, y))
            return params, opt_state, rngs, jnp.sum(losses, 0), jnp.sum(mses, 0)

        def eval_epoch(params, rngs, enc, dec, y):
            def one_seed(params, rng, enc_b, dec_b, y_b, i):
                r1, r2 = jax.random.split(jax.random.fold_in(rng, i))
                out = model.apply({"params": params}, enc_b, dec_b, y_b,
                                  training=False,
                                  rngs={"noise": r1, "sampling": r2})
                return out.loss, out.mse, out.predictions

            v_eval = jax.vmap(one_seed, in_axes=(0, 0, None, None, None, None))

            def body(i, batch):
                enc_b, dec_b, y_b = batch
                return i + 1, v_eval(params, rngs, enc_b, dec_b, y_b, i)

            _, (losses, mses, preds) = jax.lax.scan(
                body, jnp.zeros((), jnp.uint32), (enc, dec, y))
            # axes: (batches, seeds, ...) -> per-seed sums
            return jnp.sum(losses, 0), jnp.sum(mses, 0), preds

        # as in train.Trainer: 'raise' mode keeps the caller's state
        # buffers alive for post-catch inspection
        donate = () if self.nonfinite_guard == "raise" else (0, 1)
        self._train_epoch = jax.jit(train_epoch, donate_argnums=donate)
        self._eval_epoch = jax.jit(eval_epoch)

    # ------------------------------------------------------------------ #

    def init_state(self, seeds, enc, dec, y) -> MultiSeedState:
        rngs = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])

        @jax.jit
        def _init(rng):
            rng, init_rng = jax.random.split(rng)
            variables = self.model.init(
                {"params": init_rng, "noise": rng, "sampling": rng},
                jnp.asarray(enc[:2]), jnp.asarray(dec[:2]),
                jnp.asarray(y[:2]), training=True)
            return (variables["params"],
                    self.optimizer.init(variables["params"]), rng)

        params, opt_state, rngs = jax.vmap(_init)(rngs)
        return MultiSeedState(params=params, opt_state=opt_state, rngs=rngs)

    def train_epoch(self, state: MultiSeedState, data
                    ) -> Tuple[MultiSeedState, np.ndarray, np.ndarray]:
        enc, dec, y = data
        params, opt_state, rngs, loss, mse = self._train_epoch(
            state.params, state.opt_state, state.rngs, enc, dec, y)
        loss = np.asarray(loss)
        if self.nonfinite_guard == "raise" and not np.all(np.isfinite(loss)):
            from fine_grained_gaussian_process_forcasting_tpu.train.trainer import (
                NonFiniteLossError,
            )

            bad = np.flatnonzero(~np.isfinite(loss)).tolist()
            raise NonFiniteLossError(
                f"non-finite training loss for seed indices {bad} in the "
                f"epoch ending at global step {state.step + enc.shape[0]}",
                step=state.step)
        return (MultiSeedState(params, opt_state, rngs,
                               state.step + enc.shape[0]),
                loss, np.asarray(mse))

    def eval_epoch(self, state: MultiSeedState, data):
        enc, dec, y = data
        loss, mse, preds = self._eval_epoch(state.params, state.rngs,
                                            enc, dec, y)
        return np.asarray(loss), np.asarray(mse), preds

    def seed_params(self, state: MultiSeedState, i: int):
        """Extract one replica's params (e.g. for checkpointing).

        Jitted as one dispatch: eager per-leaf slicing compiles ~1 tiny
        program per leaf (13s for a 129-leaf tree over a remote-TPU
        tunnel, measured).
        """
        if not hasattr(self, "_extract"):
            self._extract = jax.jit(
                lambda p, j: jax.tree_util.tree_map(lambda x: x[j], p))
        return self._extract(state.params, jnp.asarray(i))

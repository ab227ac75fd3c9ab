"""Jitted training loop: one XLA computation per epoch.

Re-design of the reference's per-batch Python loop
(``train.py:152-195``): the whole dataset lives on device and a
``lax.scan`` over batches runs inside one jit, so an epoch is a single
dispatch.  Data parallelism comes from sharding the batch dim over the
mesh's 'data' axis; tensor parallelism from ``parallel.sharding`` rules.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fine_grained_gaussian_process_forcasting_tpu.data.window import BatchedSplit
from fine_grained_gaussian_process_forcasting_tpu.train.schedule import noam_adam


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    rng: jax.Array
    step: int = 0


class NonFiniteLossError(RuntimeError):
    """Raised by ``nonfinite_guard='raise'`` with the offending step."""

    def __init__(self, msg: str, step: int = -1):
        super().__init__(msg)
        self.step = step


class Trainer:
    """Wraps a ForecastDenoising-like Flax model with jitted epoch-level
    train/eval functions.

    model.apply must accept (variables, enc, dec, y, training, rngs) and
    return an object with .loss/.mse/.predictions.
    """

    def __init__(
        self,
        model,
        d_model: int,
        warmup_steps: int = 4000,
        lr_mul: float = 2.0,
        mesh: Optional[Mesh] = None,
        clip_grad_norm: float = 0.0,
        nonfinite_guard: str = "off",
        fsdp: bool = False,
    ):
        """``nonfinite_guard``: production fault detection the reference
        lacks (its NaNs silently poison the run, ``train.py:158-167``).
        'off' = reference semantics; 'raise' = fail the epoch with the
        first non-finite step's index (the divergence-bisect primitive,
        built after the exact-blur hunt); 'skip' = drop bad updates via
        ``optax.apply_if_finite`` and keep training."""
        if nonfinite_guard not in ("off", "raise", "skip"):
            raise ValueError(f"nonfinite_guard={nonfinite_guard!r}")
        self.model = model
        self.nonfinite_guard = nonfinite_guard
        self.optimizer = noam_adam(d_model, warmup_steps, lr_mul,
                                   clip_grad_norm=clip_grad_norm,
                                   nonfinite_guard=nonfinite_guard)
        self.mesh = mesh
        self.fsdp = fsdp  # ZeRO-style param/opt-state sharding over 'data'
        self._build()

    # ------------------------------------------------------------------ #

    def _build(self):
        model, optimizer = self.model, self.optimizer

        def loss_fn(params, rngs, enc, dec, y):
            out = model.apply(
                {"params": params}, enc, dec, y, training=True, rngs=rngs
            )
            return out.loss, out.mse

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def train_step(carry, batch):
            params, opt_state, rng = carry
            rng, r1, r2 = jax.random.split(rng, 3)
            enc, dec, y = batch
            (loss, mse), grads = grad_fn(
                params, {"noise": r1, "sampling": r2}, enc, dec, y
            )
            # per-step health: loss AND grads (a step whose grads are the
            # first non-finite value still has a finite loss — attributing
            # by loss alone would blame the NEXT batch)
            ok = jnp.isfinite(loss) & jnp.all(jnp.array(
                [jnp.all(jnp.isfinite(g))
                 for g in jax.tree_util.tree_leaves(grads)]))
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, mse, ok)

        def train_epoch(params, opt_state, rng, enc, dec, y):
            (params, opt_state, rng), (losses, mses, oks) = jax.lax.scan(
                train_step, (params, opt_state, rng), (enc, dec, y)
            )
            # index of the first unhealthy step (-1 if none): the
            # nonfinite_guard's reporting signal, ~free to compute
            bad = ~oks
            first_bad = jnp.where(jnp.any(bad), jnp.argmax(bad), -1)
            return (params, opt_state, rng, jnp.sum(losses),
                    jnp.sum(mses), first_bad)

        def eval_epoch(params, rng, enc, dec, y):
            # fresh noise per eval batch (the reference draws
            # torch.randn_like per forward, ``denoise_model_2.py:59-60``;
            # without this the iso variant would eval every batch against
            # one fixed draw)
            def step(i, batch):
                enc_b, dec_b, y_b = batch
                r1, r2 = jax.random.split(jax.random.fold_in(rng, i))
                out = model.apply(
                    {"params": params}, enc_b, dec_b, y_b, training=False,
                    rngs={"noise": r1, "sampling": r2},
                )
                return i + 1, (out.loss, out.mse, out.predictions)

            _, (losses, mses, preds) = jax.lax.scan(
                step, jnp.zeros((), jnp.uint32), (enc, dec, y))
            return jnp.sum(losses), jnp.sum(mses), preds

        # 'raise' mode must NOT donate: the caller's advertised workflow
        # is catch-the-error-then-inspect-pre-epoch-state, and donated
        # params/opt_state buffers are deleted by the jit call
        donate = () if self.nonfinite_guard == "raise" else (0, 1)
        self._train_epoch = jax.jit(train_epoch, donate_argnums=donate)
        self._eval_epoch = jax.jit(eval_epoch)

    # ------------------------------------------------------------------ #

    def init_state(self, rng: jax.Array, enc: np.ndarray, dec: np.ndarray,
                   y: np.ndarray) -> TrainState:
        rng, init_rng = jax.random.split(rng)

        # jit the whole init: eager flax init dispatches op-by-op, which is
        # painfully slow over a remote-TPU tunnel.
        @jax.jit
        def _init(init_r, r, e, d, t):
            variables = self.model.init(
                {"params": init_r, "noise": r, "sampling": r},
                e, d, t, training=True,
            )
            return variables["params"], self.optimizer.init(variables["params"])

        params, opt_state = _init(
            init_rng, rng,
            jnp.asarray(enc[:2]), jnp.asarray(dec[:2]), jnp.asarray(y[:2]),
        )
        if self.mesh is not None:
            from fine_grained_gaussian_process_forcasting_tpu.parallel.sharding import (
                opt_state_shardings,
                param_shardings,
            )

            p_shard = param_shardings(self.mesh, params, fsdp=self.fsdp)
            opt_shard = opt_state_shardings(self.mesh, opt_state, params,
                                            fsdp=self.fsdp)
            params = jax.device_put(params, p_shard)
            opt_state = jax.device_put(opt_state, opt_shard)
        return TrainState(params=params, opt_state=opt_state, rng=rng)

    def device_put_split(self, split: BatchedSplit):
        """Move a batched split to device, batch dim sharded over 'data'."""
        arrs = (split.enc, split.dec, split.y)
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrs)
        sharding = NamedSharding(self.mesh, P(None, "data"))
        return tuple(jax.device_put(a, sharding) for a in arrs)

    def train_epoch(self, state: TrainState, data) -> Tuple[TrainState, float, float]:
        enc, dec, y = data
        params, opt_state, rng, loss, mse, first_bad = self._train_epoch(
            state.params, state.opt_state, state.rng, enc, dec, y
        )
        if self.nonfinite_guard == "raise":
            bad = int(first_bad)
            if bad >= 0:
                raise NonFiniteLossError(
                    f"non-finite training loss at batch {bad} of this "
                    f"epoch (global step ~{state.step + bad}); see "
                    "scripts/exact_blur_bisect.py for the step-level "
                    "localization workflow", step=state.step + bad)
        return (
            TrainState(params, opt_state, rng, state.step + enc.shape[0]),
            float(loss),
            float(mse),
        )

    def eval_epoch(self, state: TrainState, data):
        enc, dec, y = data
        # state.rng is not consumed: eval stays reproducible for a given
        # state while noise still varies across batches within the epoch
        loss, mse, preds = self._eval_epoch(state.params, state.rng,
                                            enc, dec, y)
        return float(loss), float(mse), preds

    # -- checkpoint / resume ------------------------------------------- #

    def save_state(self, path: str, name: str, state: TrainState) -> str:
        """Full-state checkpoint (params + optimizer state) — true mid-run
        resume, which the reference's params-only ``torch.save`` lacks
        (``train.py:186-187``)."""
        from fine_grained_gaussian_process_forcasting_tpu.train.checkpoint import (
            save_checkpoint,
        )

        return save_checkpoint(path, name, jax.device_get(state.params),
                               opt_state=jax.device_get(state.opt_state))

    def restore_state(self, path: str, name: str, template: TrainState
                      ) -> TrainState:
        from fine_grained_gaussian_process_forcasting_tpu.train.checkpoint import (
            load_checkpoint,
        )

        payload = load_checkpoint(path, name, template={
            "params": jax.device_get(template.params),
            "opt_state": jax.device_get(template.opt_state),
        })
        return TrainState(params=payload["params"],
                          opt_state=payload["opt_state"],
                          rng=template.rng, step=template.step)

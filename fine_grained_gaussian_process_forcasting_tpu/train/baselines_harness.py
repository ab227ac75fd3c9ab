"""Baseline-model harness: DeepAR / N-BEATS / DLinear / CMGP on univariate windows.

Re-design of the reference's ``Baselines`` class (``baselines.py:43-301``):
same HPO space (``d_model in {32,64}``, ``stack in {1,2}`` — N-BEATS pinned
to 1, ``baselines.py:137-139``), Noam-Adam optimization, per-model losses
(DeepAR Gaussian NLL, others MSE), best-validation checkpointing, and the
``Previous_set_up_Final_errors_{exp}.csv`` error report
(``baselines.py:225-281``).
"""

from __future__ import annotations

import dataclasses
import os
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from fine_grained_gaussian_process_forcasting_tpu.data.univariate import (
    TARGET_COLUMNS,
    UnivariateBatches,
    UnivariateLoader,
)
from fine_grained_gaussian_process_forcasting_tpu.models.deepar import (
    DeepAR,
    deepar_nll,
)
from fine_grained_gaussian_process_forcasting_tpu.models.cmgp import CMGP
from fine_grained_gaussian_process_forcasting_tpu.models.dlinear import DLinear
from fine_grained_gaussian_process_forcasting_tpu.models.nbeats import NBeats
from fine_grained_gaussian_process_forcasting_tpu.train import hpo
from fine_grained_gaussian_process_forcasting_tpu.train.checkpoint import (
    save_checkpoint,
)
from fine_grained_gaussian_process_forcasting_tpu.train.schedule import noam_adam


@dataclasses.dataclass
class BaselineArgs:
    exp_name: str = "solar"
    model_name: str = "DLinear"  # DeepAR | NBeats | DLinear | CMGP
    pred_len: int = 96
    seed: int = 1234
    n_trials: int = 5
    num_epochs: int = 50
    out_dir: str = "."
    max_encoder_length: int = 8 * 24


class BaselinesHarness:
    def __init__(self, raw_data: pd.DataFrame, args: BaselineArgs,
                 formatter=None):
        self.args = args
        self.model_id = args.model_name
        self.pred_len = args.pred_len
        self.seed = args.seed

        if formatter is None:
            from fine_grained_gaussian_process_forcasting_tpu.data.experiment import (
                ExperimentConfig,
            )

            config = ExperimentConfig(
                args.pred_len, args.exp_name,
                root_folder=os.path.join(args.out_dir, "outputs"),
            )
            formatter = config.make_data_formatter()
        data = formatter.transform_data(raw_data)

        self.loader = UnivariateLoader(
            data,
            target_col=TARGET_COLUMNS[args.exp_name],
            pred_len=args.pred_len,
            max_encoder_length=args.max_encoder_length,
        )
        self.model_path = os.path.join(
            args.out_dir, f"models_{args.exp_name}_{args.pred_len}")
        os.makedirs(self.model_path, exist_ok=True)
        self.model_name = f"{args.model_name}_{args.exp_name}_{args.seed}_{args.pred_len}"
        self.best_val = 1e10
        self.best_params = None
        self.best_model = None

    # ------------------------------------------------------------------ #

    def _make_model(self, d_model: int, stack_size: int):
        L = self.args.max_encoder_length
        if self.model_id == "DeepAR":
            return DeepAR(embedding_dim=d_model, hidden_dim=d_model,
                          n_layers=stack_size)
        if self.model_id == "NBeats":
            return NBeats(backcast_length=L, forecast_length=self.pred_len,
                          hidden_layer_units=d_model)
        if self.model_id == "CMGP":
            # stack_size -> number of convolved latent processes
            return CMGP(pred_len=self.pred_len, n_latent=stack_size)
        return DLinear(seq_len=L, pred_len=self.pred_len)

    def _loss(self, model, params, x, y):
        """x: full history (b, L, 1); y: (b, pred_len, 1)."""
        if self.model_id == "DeepAR":
            # teacher forcing over [history ++ target]: predict z_t from z_{<t}
            full = jnp.concatenate([x, y], axis=1)
            mu, sigma = model.apply({"params": params}, full[:, :-1])
            tgt = full[:, 1:, 0]
            n = y.shape[1]
            return deepar_nll(mu[:, -n:], sigma[:, -n:], tgt[:, -n:])
        if self.model_id == "NBeats":
            _, forecast = model.apply({"params": params}, x)
            return jnp.mean((y[..., 0] - forecast) ** 2)
        if self.model_id == "CMGP":
            # GP hyperparameters train by exact marginal likelihood
            return model.apply({"params": params}, x, y, method="nll")
        out = model.apply({"params": params}, x)
        return jnp.mean((y - out) ** 2)

    def _predict(self, model, params, x, rng):
        if self.model_id == "DeepAR":
            samples = model.apply({"params": params}, x, self.pred_len, rng,
                                  method="sample")
            return jnp.median(samples, axis=0)[..., None]
        if self.model_id == "NBeats":
            _, forecast = model.apply({"params": params}, x)
            return forecast[..., None]
        return model.apply({"params": params}, x)

    # ------------------------------------------------------------------ #

    def objective(self, trial: hpo.Trial) -> float:
        # CMGP ignores d_model (only n_latent <- stack_size matters); pin
        # it so the 5-trial study covers distinct configs (advisor r3).
        # DLinear likewise has no d_model, but it also has no stack_size
        # axis, so its space is a single point either way.
        d_model = (trial.suggest_categorical("d_model", [32])
                   if self.model_id == "CMGP"
                   else trial.suggest_categorical("d_model", [32, 64]))
        w_steps = trial.suggest_categorical("w_steps", [4000])
        stack_size = trial.suggest_categorical(
            "stack_size", [1, 2] if self.model_id != "NBeats" else [1])

        model = self._make_model(d_model, stack_size)
        optimizer = noam_adam(d_model, w_steps)

        tl = self.loader.train_loader
        x0 = jnp.concatenate(
            [jnp.asarray(tl.x_enc[0]), jnp.asarray(tl.x_dec[0])], axis=1)
        params = model.init(jax.random.PRNGKey(self.seed), x0)["params"]
        opt_state = optimizer.init(params)

        def full_x(batches: UnivariateBatches):
            return np.concatenate([batches.x_enc, batches.x_dec], axis=2)

        train_x = jnp.asarray(full_x(tl))
        train_y = jnp.asarray(tl.y)
        valid_x = jnp.asarray(full_x(self.loader.valid_loader))
        valid_y = jnp.asarray(self.loader.valid_loader.y)

        loss_fn = lambda p, x, y: self._loss(model, p, x, y)

        @jax.jit
        def train_epoch(params, opt_state):
            def step(carry, batch):
                p, s = carry
                x, y = batch
                loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
                updates, s = optimizer.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (train_x, train_y))
            return params, opt_state, jnp.sum(losses)

        @jax.jit
        def valid_epoch(params):
            def step(_, batch):
                x, y = batch
                return None, loss_fn(params, x, y)

            _, losses = jax.lax.scan(step, None, (valid_x, valid_y))
            return jnp.sum(losses)

        val_loss = 1e10
        for epoch in range(self.args.num_epochs):
            params, opt_state, total_loss = train_epoch(params, opt_state)
            v = float(valid_epoch(params))
            if epoch % 5 == 0:
                print(f"Train epoch: {epoch}, loss: {float(total_loss):.4f}")
                print(f"val loss: {v:.4f}")
            if v < val_loss:
                val_loss = v
                if val_loss < self.best_val:
                    self.best_val = val_loss
                    self.best_params = jax.device_get(params)
                    self.best_model = model
                    save_checkpoint(self.model_path, self.model_name,
                                    self.best_params)
        return val_loss

    def run_study(self) -> hpo.Study:
        # TPE sampler to match the reference's baselines study surface
        # (``baselines.py:109-110`` attaches TPESampler + HyperbandPruner)
        study = hpo.create_study(study_name=self.model_id, sampler="tpe",
                                 seed=self.seed)
        study.optimize(self.objective, n_trials=self.args.n_trials)
        return study

    def evaluate(self) -> dict:
        assert self.best_params is not None
        tl = self.loader.test_loader
        x = jnp.asarray(np.concatenate([tl.x_enc, tl.x_dec], axis=2))
        y = tl.y

        preds = []
        for i in range(x.shape[0]):
            preds.append(np.asarray(self._predict(
                self.best_model, self.best_params, x[i],
                jax.random.PRNGKey(i))))
        preds = np.stack(preds)

        mse = float(np.mean((preds - y) ** 2))
        mae = float(np.mean(np.abs(preds - y)))
        errors = {self.model_name: {"MSE": f"{mse:.3f}", "MAE": f"{mae: .3f}"}}
        print(errors)

        error_path = os.path.join(
            self.args.out_dir,
            f"Previous_set_up_Final_errors_{self.args.exp_name}.csv")
        df = pd.DataFrame.from_dict(errors, orient="index")
        if os.path.exists(error_path):
            df_old = pd.read_csv(error_path, index_col=0)
            df = pd.concat([df_old, df], axis=0)
        df.to_csv(error_path)
        return {"mse": mse, "mae": mae}

"""Experiment harness: split -> HPO study -> epoch loop -> checkpoint -> eval.

Re-design of the reference's ``Train`` class (``train.py:21-244``) around
the jitted scan trainer.  Faithful behaviors:

- model_name encodes the full ablation config (``train.py:50-56``);
- HPO space ``d_model in {32,16} x stack in {1,3} x w_steps {4000}`` with
  duplicate pruning (``train.py:117-123``);
- best-validation checkpointing across *all* trials (``train.py:181-187``);
- loss curves appended to .npy files (``train.py:188-193``);
- test MSE/MAE (+std) appended to ``reported_errors_{exp}.csv``
  (``train.py:231-244``) and prediction tensors saved (``train.py:215-219``).
  (The reference's MAE std actually copies the MSE std — ``train.py:228`` —
  we report the real MAE std.)

TPU-first deltas: the dataset lives on device across the whole study; an
epoch is one ``lax.scan`` dispatch; 'exchange' keeps the reference's 0.4
train fraction (``train.py:72``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import numpy as np
import pandas as pd

from fine_grained_gaussian_process_forcasting_tpu.data.experiment import (
    ExperimentConfig,
)
from fine_grained_gaussian_process_forcasting_tpu.data.window import (
    batch_sampled_data,
)
from fine_grained_gaussian_process_forcasting_tpu.models.forecast_denoising import (
    ForecastDenoising,
)
from fine_grained_gaussian_process_forcasting_tpu.train import hpo
from fine_grained_gaussian_process_forcasting_tpu.train.checkpoint import (
    save_checkpoint,
)
from fine_grained_gaussian_process_forcasting_tpu.train.trainer import Trainer


@dataclasses.dataclass
class HarnessArgs:
    exp_name: str = "solar"
    model_name: str = "ATA"
    attn_type: str = "ATA"
    pred_len: int = 96
    seed: int = 1234
    n_trials: int = 5
    num_epochs: int = 50
    denoising: bool = True
    gp: bool = True
    residual: bool = False
    no_noise: bool = False
    iso: bool = False
    input_corrupt_training: bool = False
    backbone: str = "transformer"
    out_dir: str = "."
    use_pallas_gp: bool = False
    use_pallas_attention: Optional[bool] = None  # None = auto: d_k>=64
    use_fused_gp: bool = True
    num_inducing: int = 512  # field-screen winner; 256 = reference
    gp_hidden_dims: tuple = ()  # extra deep-GP hidden layers
    gp_kind: str = "variational"  # or 'exact' (full-sequence GP stretch)
    gp_ls_init: float = 0.0  # GP lengthscale init (0 = reference inert
    # init; <0 = auto sqrt(2 d); >0 explicit) — models/forecast_denoising
    exact_noise_init: float = 0.0  # exact-blur noise init (0 =
    # reference ~0.693; >0 explicit) — gp/exact_blur.py
    lam_clip_max: float = 0.005  # ELBO-weight clip ceiling (reference
    # 0.005; 0.0 = blur-only ablation) — models/forecast_denoising
    gp_inject: str = "joint"  # GP-blur injection point: joint|enc|dec|
    # none (ELBO unchanged) — models/forecast_denoising
    # HPO space overrides (reference defaults when None)
    d_model_choices: Tuple[int, ...] = (32, 16)
    stack_choices: Tuple[int, ...] = (1, 3)
    w_steps_choices: Tuple[int, ...] = (4000,)
    # sample-count overrides (None => formatter defaults, e.g. 32000/3840)
    max_train_samples: Optional[int] = None
    max_valid_samples: Optional[int] = None
    # opt-in global-norm gradient clipping (0.0 = off, the reference's
    # semantics; >0 mitigates the warmup-phase seed divergence of the
    # iso/no-denoise arms — RESULTS.md seed-stability table)
    clip_grad_norm: float = 0.0
    # non-finite-loss handling: 'off' (reference semantics: NaN poisons
    # the run), 'raise' (fail with the first bad step's index), 'skip'
    # (drop bad updates via optax.apply_if_finite) — train.trainer
    nonfinite_guard: str = "off"
    # ZeRO/FSDP: shard param + optimizer-state storage over the mesh's
    # 'data' axis (parallel.sharding.fsdp_specs); needs a mesh
    fsdp: bool = False


class ExperimentHarness:
    def __init__(self, raw_data: pd.DataFrame, args: HarnessArgs,
                 mesh=None):
        self.args = args
        self.mesh = mesh
        self.input_corrupt = args.input_corrupt_training
        self.denoising = args.denoising if not self.input_corrupt else False
        self.gp = args.gp

        config = ExperimentConfig(
            args.pred_len, args.exp_name,
            root_folder=os.path.join(args.out_dir, "outputs"),
        )
        self.formatter = config.make_data_formatter()
        self.params = self.formatter.get_experiment_params()
        self.model_params = self.formatter.get_default_model_params()
        self.batch_size = self.model_params["minibatch_size"][0]
        self.pred_len = args.pred_len
        self.seed = args.seed

        self.model_path = os.path.join(
            args.out_dir, f"models_{args.exp_name}_{args.pred_len}"
        )
        os.makedirs(self.model_path, exist_ok=True)

        self.model_name = "{}_{}_{}_{}{}{}{}{}{}{}".format(
            args.model_name, args.exp_name, args.pred_len, args.seed,
            "_denoise" if self.denoising else "",
            "_gp" if self.gp else "",
            "_predictions" if args.no_noise else "",
            "_iso" if args.iso else "",
            "_residual" if args.residual else "",
            "_input_corrupt" if self.input_corrupt else "",
        )

        self.best_val = 1e10
        self.best_params = None
        self.best_config = None
        self.raw_data = raw_data
        self.train_data, self.valid_data, self.test_data = self._split_data()

        # crash-safe study resume: completed trials (value + best-so-far
        # aggregates) persist to a JSON next to the loss curves, so a
        # killed/crashed study restarted with the same flags skips straight
        # to the first unfinished trial (best params are already on disk as
        # checkpoints; the compilation cache makes the restart cheap).
        # Exceeds the reference, which loses the whole study on a crash.
        self._study_state_path = os.path.join(
            args.out_dir, "losses_lists", f"{self.model_name}_study.json")
        self._completed_trials = {}
        self._load_study_state()

    # ------------------------------------------------------------------ #

    def _load_study_state(self) -> None:
        import json

        if not os.path.exists(self._study_state_path):
            return
        with open(self._study_state_path) as f:
            st = json.load(f)
        self._completed_trials = st.get("trials", {})
        self._apply_study_state(st)

    def _apply_study_state(self, st: dict) -> None:
        if st.get("best_config") is not None:
            self.best_val = st["best_val"]
            self.best_config = tuple(st["best_config"])

    def _study_state_payload(self) -> dict:
        return {
            "trials": self._completed_trials,
            "best_val": self.best_val,
            "best_config": list(self.best_config) if self.best_config else None,
        }

    def _save_study_state(self) -> None:
        import json

        os.makedirs(os.path.dirname(self._study_state_path), exist_ok=True)
        tmp = self._study_state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._study_state_payload(), f)
        os.replace(tmp, self._study_state_path)

    def _load_best_params(self, model_name: str, d_model: int,
                          stack_size: int):
        """Rebuild a checkpointed best-params tree after a restart."""
        from fine_grained_gaussian_process_forcasting_tpu.train.checkpoint import (
            load_checkpoint,
        )

        model = self._make_model(d_model, stack_size)
        trainer = Trainer(model, d_model=d_model)
        state = trainer.init_state(
            jax.random.PRNGKey(0), self.test_data.enc[0],
            self.test_data.dec[0], self.test_data.y[0])
        params = load_checkpoint(
            self.model_path, model_name,
            template={"params": jax.device_get(state.params)})["params"]
        # orbax restores the SAVED shapes regardless of the template; a
        # restart with a changed HPO grid (or a crash between the per-epoch
        # checkpoint save and the study-state save) can leave the study
        # JSON's best_config pointing at an incompatible checkpoint —
        # fail loudly here instead of deep inside model.apply.
        def _check(a, b):
            if a.shape != b.shape:
                raise ValueError(
                    f"checkpoint {model_name!r} has param shape {b.shape} "
                    f"but the study state expects {a.shape} — the on-disk "
                    f"study JSON ({self._study_state_path}) is stale "
                    "relative to the checkpoint; delete it (or the "
                    "checkpoint) and re-run.")
        jax.tree_util.tree_map(_check, state.params, params)
        return params

    # ------------------------------------------------------------------ #

    def _split_data(self):
        data = self.formatter.transform_data(self.raw_data)
        train_max, valid_max = self.formatter.get_num_samples_for_calibration()
        if self.args.max_train_samples is not None:
            train_max = self.args.max_train_samples
        if self.args.max_valid_samples is not None:
            valid_max = self.args.max_valid_samples
        train_frac = 0.4 if self.args.exp_name == "exchange" else 0.8
        # drop-last batching would otherwise yield ZERO batches for any
        # split whose sample cap is below the dataset's batch size (e.g.
        # --max_train_samples 128 with solar's minibatch 256; valid/test
        # are capped at valid_max)
        cap = min(train_max, valid_max)
        if cap < self.batch_size:
            self.batch_size = max(1, cap)
        return batch_sampled_data(
            data, train_frac, (train_max, valid_max),
            self.params["total_time_steps"], self.params["num_encoder_steps"],
            self.pred_len, self.params["column_definition"], self.batch_size,
        )

    def _make_model(self, d_model: int, stack_size: int) -> ForecastDenoising:
        n_heads = self.model_params["num_heads"]
        d_k = d_model // n_heads
        assert d_model % d_k == 0
        return ForecastDenoising(
            src_input_size=self.train_data.enc.shape[-1],
            tgt_input_size=self.train_data.dec.shape[-1],
            d_model=d_model,
            n_heads=n_heads,
            d_k=d_k,
            stack_size=stack_size,
            pred_len=self.pred_len,
            attn_type=self.args.attn_type,
            backbone=self.args.backbone,
            gp=self.gp,
            denoise=self.denoising,
            no_noise=self.args.no_noise,
            residual=self.args.residual,
            input_corrupt=self.input_corrupt,
            num_inducing=self.args.num_inducing,
            gp_hidden_dims=tuple(self.args.gp_hidden_dims),
            gp_kind=self.args.gp_kind,
            gp_ls_init=self.args.gp_ls_init,
            exact_noise_init=self.args.exact_noise_init,
            lam_clip_max=self.args.lam_clip_max,
            gp_inject=self.args.gp_inject,
            use_pallas_gp=self.args.use_pallas_gp,
            use_pallas_attention=self.args.use_pallas_attention,
            use_fused_gp=self.args.use_fused_gp,
        )

    # ------------------------------------------------------------------ #

    def objective(self, trial: hpo.Trial) -> float:
        args = self.args
        d_model = trial.suggest_categorical("d_model", list(args.d_model_choices))
        w_steps = trial.suggest_categorical("w_steps", list(args.w_steps_choices))
        stack_size = trial.suggest_categorical("stack_size", list(args.stack_choices))

        trial_key = f"d{d_model}_w{w_steps}_s{stack_size}"
        if trial_key in self._completed_trials:
            val = self._completed_trials[trial_key]
            print(f"trial {trial_key}: resumed from study state "
                  f"(val {val:.4f})")
            return val

        model = self._make_model(d_model, stack_size)
        trainer = Trainer(model, d_model=d_model, warmup_steps=w_steps,
                          mesh=self.mesh, fsdp=self.args.fsdp,
                          clip_grad_norm=self.args.clip_grad_norm,
                          nonfinite_guard=self.args.nonfinite_guard)

        train_dev = trainer.device_put_split(self.train_data)
        valid_dev = trainer.device_put_split(self.valid_data)

        state = trainer.init_state(
            jax.random.PRNGKey(self.seed + trial.number),
            self.train_data.enc[0], self.train_data.dec[0], self.train_data.y[0],
        )

        from fine_grained_gaussian_process_forcasting_tpu.train.observability import (
            MetricsLogger,
            StepTimer,
        )

        metrics = MetricsLogger(os.path.join(
            args.out_dir, "losses_lists", f"{self.model_name}_metrics.jsonl"))
        timer = StepTimer()

        val_loss = 1e10
        curves_train, curves_valid = [], []
        for epoch in range(args.num_epochs):
            state, total_loss, total_mse = trainer.train_epoch(state, train_dev)
            v_loss, v_mse, _ = trainer.eval_epoch(state, valid_dev)
            epoch_s = timer.tick()
            curves_train.append(total_mse)
            curves_valid.append(v_mse)
            metrics.log(epoch, train_loss=total_loss, train_mse=total_mse,
                        valid_loss=v_loss, valid_mse=v_mse,
                        epoch_seconds=epoch_s)
            if epoch % 5 == 0:
                print(f"Train epoch: {epoch}, loss: {total_loss:.4f}")
                print(f"val loss: {v_loss:.4f}")
            if v_loss < val_loss:
                val_loss = v_loss
                if val_loss < self.best_val:
                    self.best_val = val_loss
                    self.best_params = jax.device_get(state.params)
                    self.best_config = (d_model, stack_size)
                    save_checkpoint(self.model_path, self.model_name,
                                    self.best_params)

        losses_dir = os.path.join(args.out_dir, "losses_lists")
        os.makedirs(losses_dir, exist_ok=True)
        np.save(os.path.join(
            losses_dir, f"{self.model_name}_mse_losses_train.npy"),
            np.asarray(curves_train))
        np.save(os.path.join(
            losses_dir, f"{self.model_name}_mse_losses_valid.npy"),
            np.asarray(curves_valid))
        self._completed_trials[trial_key] = val_loss
        self._save_study_state()
        return val_loss

    def run_study(self) -> hpo.Study:
        study = hpo.create_study(study_name=self.args.model_name,
                                 sampler="grid", seed=self.seed)
        study.optimize(self.objective, n_trials=self.args.n_trials)
        best = study.best_trial
        print("Best trial:")
        print("  Value: ", best.value)
        print("  Params: ")
        for key, value in best.params.items():
            print(f"    {key}: {value}")
        return study

    # ------------------------------------------------------------------ #

    def evaluate(self) -> dict:
        if self.best_params is None and self.best_config is not None:
            # restarted process: best params live in the checkpoint
            self.best_params = self._load_best_params(
                self.model_name, *self.best_config)
        assert self.best_params is not None, "run_study first"
        d_model, stack_size = self.best_config
        model = self._make_model(d_model, stack_size)
        trainer = Trainer(model, d_model=d_model, mesh=self.mesh,
                          fsdp=self.args.fsdp)
        test_dev = trainer.device_put_split(self.test_data)

        from fine_grained_gaussian_process_forcasting_tpu.train.trainer import (
            TrainState,
        )

        state = TrainState(params=self.best_params, opt_state=None,
                           rng=jax.random.PRNGKey(0))
        _, _, preds = trainer.eval_epoch(state, test_dev)
        preds = np.asarray(preds)[..., 0]  # (nb, bs, pred_len)
        test_y = self.test_data.y[..., 0]

        mse_all = (preds - test_y) ** 2
        mae_all = np.abs(preds - test_y)
        errors = {
            "MSE": f"{mse_all.mean():.3f} {mse_all.std():.4f}",
            "MAE": f"{mae_all.mean(): .3f} {mae_all.std():.4f}",
        }
        print({self.model_name: errors})

        tensor_dir = os.path.join(self.args.out_dir, self.args.exp_name)
        os.makedirs(tensor_dir, exist_ok=True)
        np.savez(os.path.join(tensor_dir, f"{self.model_name}.npz"),
                 predictions=preds, test_y=test_y)

        error_path = os.path.join(
            self.args.out_dir, f"reported_errors_{self.args.exp_name}.csv")
        df = pd.DataFrame.from_dict({self.model_name: errors}, orient="index")
        if os.path.exists(error_path):
            df_old = pd.read_csv(error_path, index_col=0)
            df = pd.concat([df_old, df], axis=0)
        df.to_csv(error_path)
        return {"mse": float(mse_all.mean()), "mae": float(mae_all.mean()),
                "errors": errors}


class MultiSeedExperimentHarness(ExperimentHarness):
    """Trains the reference's N-seed protocol (``train.py:266-280``) as ONE
    vmapped dispatch per epoch instead of N sequential studies.

    Semantics match N sequential :class:`ExperimentHarness` runs with
    per-seed keys ``PRNGKey(seed + trial.number)`` (the vmap-vs-sequential
    equivalence is pinned by ``tests/test_multiseed.py``); on TPU the
    replicated GEMMs fill the chip the reference's tiny dims leave idle.
    """

    def __init__(self, raw_data: pd.DataFrame, args: HarnessArgs, seeds,
                 mesh=None):
        self.seeds = tuple(int(s) for s in seeds)
        n = len(self.seeds)
        # before super().__init__: _load_study_state restores into these
        self.best_val_seed = [1e10] * n
        self.best_params_seed = [None] * n
        self.best_config_seed = [None] * n
        super().__init__(raw_data, args, mesh=mesh)

    def _apply_study_state(self, st: dict) -> None:
        super()._apply_study_state(st)
        vals = st.get("best_val_seed") or []
        cfgs = st.get("best_config_seed") or []
        for i, (v, c) in enumerate(zip(vals, cfgs)):
            if i < len(self.seeds) and c is not None:
                self.best_val_seed[i] = v
                self.best_config_seed[i] = tuple(c)

    def _study_state_payload(self) -> dict:
        payload = super()._study_state_payload()
        payload["best_val_seed"] = self.best_val_seed
        payload["best_config_seed"] = [
            list(c) if c is not None else None for c in self.best_config_seed
        ]
        return payload

    def _name_for_seed(self, seed: int) -> str:
        args = self.args
        return "{}_{}_{}_{}{}{}{}{}{}{}".format(
            args.model_name, args.exp_name, args.pred_len, seed,
            "_denoise" if self.denoising else "",
            "_gp" if self.gp else "",
            "_predictions" if args.no_noise else "",
            "_iso" if args.iso else "",
            "_residual" if args.residual else "",
            "_input_corrupt" if self.input_corrupt else "",
        )

    def objective(self, trial: hpo.Trial) -> float:
        from fine_grained_gaussian_process_forcasting_tpu.train.multiseed import (
            MultiSeedTrainer,
        )

        args = self.args
        d_model = trial.suggest_categorical("d_model", list(args.d_model_choices))
        w_steps = trial.suggest_categorical("w_steps", list(args.w_steps_choices))
        stack_size = trial.suggest_categorical("stack_size", list(args.stack_choices))

        trial_key = f"d{d_model}_w{w_steps}_s{stack_size}"
        if trial_key in self._completed_trials:
            val = self._completed_trials[trial_key]
            print(f"trial {trial_key}: resumed from study state "
                  f"(val {val:.4f})")
            return val

        model = self._make_model(d_model, stack_size)
        trainer = MultiSeedTrainer(model, d_model=d_model,
                                   n_seeds=len(self.seeds),
                                   warmup_steps=w_steps,
                                   clip_grad_norm=self.args.clip_grad_norm,
                                   nonfinite_guard=self.args.nonfinite_guard)

        train_dev = tuple(jax.device_put(a) for a in (
            self.train_data.enc, self.train_data.dec, self.train_data.y))
        valid_dev = tuple(jax.device_put(a) for a in (
            self.valid_data.enc, self.valid_data.dec, self.valid_data.y))

        state = trainer.init_state(
            [s + trial.number for s in self.seeds],
            self.train_data.enc[0], self.train_data.dec[0],
            self.train_data.y[0],
        )

        val_best = np.full(len(self.seeds), 1e10)
        curves_train, curves_valid = [], []
        for epoch in range(args.num_epochs):
            state, loss, mse = trainer.train_epoch(state, train_dev)
            v_loss, v_mse, _ = trainer.eval_epoch(state, valid_dev)
            curves_train.append(mse)
            curves_valid.append(v_mse)
            if epoch % 5 == 0:
                print(f"Train epoch: {epoch}, loss: "
                      + " ".join(f"{x:.4f}" for x in loss))
                print("val loss: " + " ".join(f"{x:.4f}" for x in v_loss))
            improved = v_loss < val_best
            val_best = np.minimum(val_best, v_loss)
            for i in np.flatnonzero(improved):
                if v_loss[i] < self.best_val_seed[i]:
                    self.best_val_seed[i] = float(v_loss[i])
                    self.best_params_seed[i] = jax.device_get(
                        trainer.seed_params(state, int(i)))
                    self.best_config_seed[i] = (d_model, stack_size)
                    save_checkpoint(self.model_path,
                                    self._name_for_seed(self.seeds[i]),
                                    self.best_params_seed[i])

        losses_dir = os.path.join(args.out_dir, "losses_lists")
        os.makedirs(losses_dir, exist_ok=True)
        for i, seed in enumerate(self.seeds):
            name = self._name_for_seed(seed)
            np.save(os.path.join(losses_dir, f"{name}_mse_losses_train.npy"),
                    np.asarray(curves_train)[:, i])
            np.save(os.path.join(losses_dir, f"{name}_mse_losses_valid.npy"),
                    np.asarray(curves_valid)[:, i])
        value = float(val_best.mean())
        self._completed_trials[trial_key] = value
        self._save_study_state()
        return value

    def evaluate(self) -> list:
        """Per-seed evaluation via the single-seed machinery."""
        results = []
        for i, seed in enumerate(self.seeds):
            if (self.best_params_seed[i] is None
                    and self.best_config_seed[i] is not None):
                self.best_params_seed[i] = self._load_best_params(
                    self._name_for_seed(seed), *self.best_config_seed[i])
            assert self.best_params_seed[i] is not None, "run_study first"
            self.best_params = self.best_params_seed[i]
            self.best_config = self.best_config_seed[i]
            self.model_name = self._name_for_seed(seed)
            results.append(super().evaluate())
        return results

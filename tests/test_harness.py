"""End-to-end harness smoke test: synthetic solar -> study -> eval -> CSV."""

import os

import numpy as np
import pandas as pd

from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)
from fine_grained_gaussian_process_forcasting_tpu.train.harness import (
    ExperimentHarness,
    HarnessArgs,
)
from fine_grained_gaussian_process_forcasting_tpu.train import hpo


def test_hpo_grid_enumeration():
    calls = []

    def objective(trial):
        d = trial.suggest_categorical("d", [1, 2])
        s = trial.suggest_categorical("s", [10, 20])
        calls.append((d, s))
        return d + s

    study = hpo.create_study(sampler="grid", seed=0)
    study.optimize(objective, n_trials=8)
    complete = study.get_trials(states=["COMPLETE"])
    assert len(complete) == 4  # grid exhausted, duplicates pruned
    assert study.best_trial.value == 11
    assert len({tuple(sorted(t.params.items())) for t in complete}) == 4


def test_harness_end_to_end(tmp_path):
    raw = make_synthetic_frame("solar", num_entities=3, steps_per_entity=500,
                               seed=1)
    args = HarnessArgs(
        exp_name="solar",
        model_name="ATA_smoke",
        attn_type="basic",
        pred_len=24,
        seed=11,
        n_trials=1,
        num_epochs=2,
        denoising=True,
        gp=True,
        num_inducing=16,
        out_dir=str(tmp_path),
        d_model_choices=(16,),
        stack_choices=(1,),
        w_steps_choices=(100,),
    )
    harness = ExperimentHarness(raw, args)
    # shrink the device-resident data for test speed: keep 2 batches
    from fine_grained_gaussian_process_forcasting_tpu.data.window import (
        BatchedSplit,
    )

    def shrink(split, n=2, bs=32):
        return BatchedSplit(enc=split.enc[:n, :bs], dec=split.dec[:n, :bs],
                            y=split.y[:n, :bs])

    harness.train_data = shrink(harness.train_data)
    harness.valid_data = shrink(harness.valid_data)
    harness.test_data = shrink(harness.test_data)

    study = harness.run_study()
    assert study.best_trial.value is not None
    result = harness.evaluate()
    assert np.isfinite(result["mse"])

    err_csv = os.path.join(str(tmp_path), "reported_errors_solar.csv")
    assert os.path.exists(err_csv)
    df = pd.read_csv(err_csv, index_col=0)
    assert "MSE" in df.columns
    # checkpoint written
    ckpt_dir = os.path.join(str(tmp_path), "models_solar_24")
    assert any(os.scandir(ckpt_dir))
    # loss curves written
    assert os.path.exists(
        os.path.join(str(tmp_path), "losses_lists",
                     f"{harness.model_name}_mse_losses_train.npy")
    )


def test_hpo_pruning_api():
    """report/should_prune median rule (HyperbandPruner stand-in)."""
    study = hpo.create_study(sampler="grid", seed=0)

    def objective(trial):
        d = trial.suggest_categorical("d", [1, 2, 3])
        for step in range(10):
            # trial with d=3 is consistently worse
            trial.report(float(d * 10 + step if d == 3 else step), step)
            if trial.should_prune():
                raise hpo.TrialPruned()
        return float(d)

    study.optimize(objective, n_trials=3)
    states = {t.params.get("d"): t.state for t in study.trials}
    assert states[1] == "COMPLETE"
    assert states[3] == "PRUNED"
    assert study.best_trial.value == 1.0

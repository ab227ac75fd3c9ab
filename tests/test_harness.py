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


def test_study_resume_skips_completed_trials(tmp_path):
    """Crash-safe study resume: a restarted harness skips finished trials
    (persisted study JSON) and evaluate() reloads best params from the
    checkpoint instead of process memory."""
    raw = make_synthetic_frame("solar", num_entities=3, steps_per_entity=500,
                               seed=1)

    def make_args(n_trials):
        return HarnessArgs(
            exp_name="solar", model_name="resume_smoke", attn_type="basic",
            pred_len=24, seed=11, n_trials=n_trials, num_epochs=1,
            denoising=False, gp=False, num_inducing=8,
            out_dir=str(tmp_path), d_model_choices=(16,),
            stack_choices=(1, 3), w_steps_choices=(100,),
            max_train_samples=64, max_valid_samples=64,
        )

    h1 = ExperimentHarness(raw, make_args(n_trials=1))
    h1.run_study()  # completes only the first grid point
    state_json = h1._study_state_path
    assert os.path.exists(state_json)
    assert len(h1._completed_trials) == 1
    (key1, val1), = h1._completed_trials.items()

    # "restart": fresh harness, full grid — trial 1 must be skipped with
    # the recorded value, trial 2 runs fresh
    h2 = ExperimentHarness(raw, make_args(n_trials=2))
    assert h2._completed_trials == {key1: val1}
    study = h2.run_study()
    assert len(h2._completed_trials) == 2
    assert study.best_trial.value is not None

    # simulate losing in-memory best params: evaluate() must reload from
    # the checkpoint on disk
    h3 = ExperimentHarness(raw, make_args(n_trials=2))
    assert h3.best_config is not None and h3.best_params is None
    result = h3.evaluate()
    assert np.isfinite(result["mse"])


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


def test_hpo_early_duplicate_pruning():
    """A duplicate config is abandoned inside suggest_categorical, before
    the objective body runs (reference behavior, train.py:121-123)."""
    study = hpo.create_study(sampler="random", seed=0)
    ran = []

    def objective(trial):
        a = trial.suggest_categorical("a", [1, 2])
        ran.append(a)  # only reached for non-duplicate configs
        return float(a)

    study.optimize(objective, n_trials=12)
    # objective body ran at most once per distinct config
    assert sorted(set(ran)) == sorted(ran)
    pruned = [t for t in study.trials if t.state == "PRUNED"]
    assert pruned and all(not t.intermediate for t in pruned)


def test_hpo_tpe_converges_to_known_optimum():
    """TPE concentrates samples on the best grid cell of a 2-param space."""
    def objective(trial):
        x = trial.suggest_categorical("x", list(range(8)))
        y = trial.suggest_categorical("y", list(range(8)))
        # optimum at (2, 1)
        return (x - 2) ** 2 + (y - 1) ** 2 + 0.01 * x

    def run(sampler, seed):
        study = hpo.create_study(sampler=sampler, seed=seed)
        study.optimize(objective, n_trials=32)
        done = [t for t in study.trials if t.state == "COMPLETE"]
        return study, done

    tpe_best, tpe_means = [], []
    rnd_means = []
    for seed in range(5):
        s, done = run("tpe", seed)
        tpe_best.append(s.best_trial.value)
        tpe_means.append(np.mean([t.value for t in done]))
        _, rdone = run("random", seed)
        rnd_means.append(np.mean([t.value for t in rdone]))
    # TPE finds a near-optimal cell (optimum value is 0.02)
    assert min(tpe_best) <= 1.1, tpe_best
    # and concentrates its sampling: mean explored value beats random
    assert np.mean(tpe_means) < np.mean(rnd_means), (tpe_means, rnd_means)


def test_hpo_parallel_trials():
    """n_jobs > 1 runs trials thread-parallel with a consistent study."""
    import threading

    study = hpo.create_study(sampler="random", seed=3)
    seen_threads = set()

    def objective(trial):
        a = trial.suggest_categorical("a", list(range(32)))
        seen_threads.add(threading.get_ident())
        return float(a)

    study.optimize(objective, n_trials=16, n_jobs=4)
    assert len(seen_threads) > 1
    done = [t for t in study.trials if t.state == "COMPLETE"]
    assert done
    assert study.best_trial.value == min(t.value for t in done)
    # no config recorded twice
    seen = [tuple(sorted(t.params.items())) for t in done]
    assert len(seen) == len(set(seen))

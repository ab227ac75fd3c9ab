"""CLI / evaluator / baselines-harness / download surface tests."""

import os

import numpy as np
import pandas as pd
import pytest

from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)


def test_download_synthetic(tmp_path):
    from fine_grained_gaussian_process_forcasting_tpu.data import download

    path = download.main([
        "--expt_name", "solar", "--output_folder", str(tmp_path),
        "--synthetic",
    ])
    assert os.path.exists(path)
    df = pd.read_csv(path)
    assert "Power(MW)" in df.columns
    # skip when already present
    path2 = download.main([
        "--expt_name", "solar", "--output_folder", str(tmp_path),
        "--force_download", "no",
    ])
    assert path2 == path


def test_cli_end_to_end(tmp_path):
    from fine_grained_gaussian_process_forcasting_tpu.train import cli

    results = cli.main([
        "--exp_name", "solar", "--synthetic", "--attn_type", "basic",
        "--model_name", "cli_smoke", "--num_epochs", "1", "--n_trials", "1",
        "--n_seeds", "1", "--pred_len", "24",
        "--out_dir", str(tmp_path), "--num_inducing", "8",
        "--max_train_samples", "512", "--max_valid_samples", "256",
    ])
    assert len(results) == 1
    assert np.isfinite(results[0]["mse"])
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "reported_errors_solar.csv"))


def test_evaluate_checkpoints_roundtrip(tmp_path):
    """Train -> checkpoint -> reload via the evaluator -> figures."""
    from fine_grained_gaussian_process_forcasting_tpu.train.harness import (
        ExperimentHarness,
        HarnessArgs,
    )
    from fine_grained_gaussian_process_forcasting_tpu.train.evaluate_checkpoints import (
        EvalArgs,
        evaluate_checkpoints,
        plot_forecasts,
        plot_per_step_errors,
    )

    raw = make_synthetic_frame("solar", num_entities=3, steps_per_entity=400,
                               seed=3)
    seed = 77
    args = HarnessArgs(
        exp_name="solar", model_name="basic", attn_type="basic",
        pred_len=24, seed=seed, n_trials=1, num_epochs=1, denoising=True,
        gp=True, num_inducing=8, out_dir=str(tmp_path),
        d_model_choices=(16,), stack_choices=(1,), w_steps_choices=(100,),
    )
    harness = ExperimentHarness(raw, args)
    from fine_grained_gaussian_process_forcasting_tpu.data.window import (
        BatchedSplit,
    )

    def shrink(split, n=1, bs=16):
        return BatchedSplit(enc=split.enc[:n, :bs], dec=split.dec[:n, :bs],
                            y=split.y[:n, :bs])

    harness.train_data = shrink(harness.train_data)
    harness.valid_data = shrink(harness.valid_data)
    harness.test_data = shrink(harness.test_data)
    harness.run_study()

    results = evaluate_checkpoints(raw, EvalArgs(
        exp_name="solar", pred_len=24, seeds=(seed,),
        attn_types=("basic",), d_models=(16,), stack_sizes=(1,),
        denoising=True, gp=True, out_dir=str(tmp_path), num_inducing=8,
        max_samples=64, batch_size=32,
    ))
    assert len(results) == 1
    r = next(iter(results.values()))
    assert r["per_step_mse"].shape == (24,)
    p1 = plot_per_step_errors(results, "solar", str(tmp_path))
    p2 = plot_forecasts(results, "solar", str(tmp_path))
    assert os.path.exists(p1) and os.path.exists(p2)

    # model_prefix override resolves run-labelled checkpoint names, and
    # shape-mismatched configs (d32 template vs saved d16) are skipped
    # cleanly instead of crashing in apply (orbax restores saved shapes
    # regardless of the template)
    results = evaluate_checkpoints(raw, EvalArgs(
        exp_name="solar", pred_len=24, seeds=(seed,),
        attn_types=("basic",), model_prefix="basic",
        d_models=(16, 32), stack_sizes=(1,),
        denoising=True, gp=True, out_dir=str(tmp_path), num_inducing=8,
        max_samples=64, batch_size=32,
    ))
    assert len(results) == 1 and "_d16_" in next(iter(results))


@pytest.mark.parametrize("model_name", ["DLinear", "NBeats", "DeepAR"])
def test_baselines_harness(tmp_path, model_name):
    from fine_grained_gaussian_process_forcasting_tpu.train.baselines_harness import (
        BaselineArgs,
        BaselinesHarness,
    )

    raw = make_synthetic_frame("electricity", num_entities=2,
                               steps_per_entity=900, seed=5)
    args = BaselineArgs(
        exp_name="electricity", model_name=model_name, pred_len=8,
        seed=3, n_trials=1, num_epochs=1, out_dir=str(tmp_path),
        max_encoder_length=48,
    )
    h = BaselinesHarness(raw, args)
    # shrink for speed
    from fine_grained_gaussian_process_forcasting_tpu.data.univariate import (
        UnivariateBatches,
    )

    def shrink(b, n=1, bs=16):
        return UnivariateBatches(x_enc=b.x_enc[:n, :bs], x_dec=b.x_dec[:n, :bs],
                                 y=b.y[:n, :bs])

    h.loader.train_loader = shrink(h.loader.train_loader)
    h.loader.valid_loader = shrink(h.loader.valid_loader)
    h.loader.test_loader = shrink(h.loader.test_loader)
    h.run_study()
    result = h.evaluate()
    assert np.isfinite(result["mse"])
    assert os.path.exists(os.path.join(
        str(tmp_path), "Previous_set_up_Final_errors_electricity.csv"))


def test_normalizers_and_lploss():
    import jax.numpy as jnp

    from fine_grained_gaussian_process_forcasting_tpu.utils.normalizers import (
        GaussianNormalizer,
        LpLoss,
        RangeNormalizer,
        UnitGaussianNormalizer,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(3, 2, size=(32, 10)).astype(np.float32))
    for norm_cls in (UnitGaussianNormalizer, GaussianNormalizer):
        norm = norm_cls(x)
        np.testing.assert_allclose(np.asarray(norm.decode(norm.encode(x))),
                                   np.asarray(x), rtol=1e-4, atol=1e-4)
    rn = RangeNormalizer(x)
    enc = rn.encode(x)
    assert float(enc.min()) >= -1e-5 and float(enc.max()) <= 1 + 1e-5
    np.testing.assert_allclose(np.asarray(rn.decode(enc)), np.asarray(x),
                               rtol=1e-3, atol=1e-3)

    loss = LpLoss()
    y = x + 0.1
    assert float(loss(x, x)) < 1e-6
    assert float(loss(x, y)) > 0


def test_profile_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp

    from fine_grained_gaussian_process_forcasting_tpu.train.observability import (
        StepTimer,
        profile_trace,
    )

    trace_dir = str(tmp_path / "trace")
    with profile_trace(trace_dir):
        x = jnp.ones((64, 64))
        jax.block_until_ready(jax.jit(lambda a: a @ a)(x))
    found = []
    for root, _, files in os.walk(trace_dir):
        found.extend(files)
    assert found, "no trace files captured"

    timer = StepTimer()
    timer.tick()
    timer.tick()
    assert timer.steps_per_sec > 0

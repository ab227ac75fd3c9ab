"""Vmapped multi-seed trainer: equivalence with sequential training."""

import jax
import jax.numpy as jnp
import numpy as np

from fine_grained_gaussian_process_forcasting_tpu.models.forecast_denoising import (
    ForecastDenoising,
)
from fine_grained_gaussian_process_forcasting_tpu.train.multiseed import (
    MultiSeedTrainer,
)
from fine_grained_gaussian_process_forcasting_tpu.train.trainer import Trainer


def _data(nb=3, bs=4, enc_len=12, dec_len=4, feat=3, pred=4, seed=0):
    rng = np.random.default_rng(seed)
    enc = rng.normal(size=(nb, bs, enc_len, feat)).astype(np.float32)
    dec = rng.normal(size=(nb, bs, dec_len, feat)).astype(np.float32)
    y = rng.normal(size=(nb, bs, pred, 1)).astype(np.float32)
    return jnp.asarray(enc), jnp.asarray(dec), jnp.asarray(y)


def _model(**kw):
    return ForecastDenoising(
        src_input_size=3, tgt_input_size=3, d_model=8, n_heads=2, d_k=4,
        stack_size=1, pred_len=4, attn_type="basic", **kw)


def test_multiseed_matches_sequential_trainers():
    """Two vmapped replicas == two sequential Trainer runs with the same
    per-seed PRNG keys (same init, same updates, same losses)."""
    model = _model(gp=True, denoise=True, num_inducing=8)
    data = _data()
    seeds = [11, 23]

    ms = MultiSeedTrainer(model, d_model=8, n_seeds=2)
    ms_state = ms.init_state(seeds, np.asarray(data[0][0]),
                             np.asarray(data[1][0]), np.asarray(data[2][0]))
    ms_state, ms_loss, ms_mse = ms.train_epoch(ms_state, data)

    for i, seed in enumerate(seeds):
        tr = Trainer(model, d_model=8)
        # replicate MultiSeedTrainer's key handling: init consumes a split
        rng = jax.random.PRNGKey(seed)
        rng, init_rng = jax.random.split(rng)
        variables = model.init(
            {"params": init_rng, "noise": rng, "sampling": rng},
            data[0][0][:2], data[1][0][:2], data[2][0][:2], training=True)
        params = variables["params"]
        opt_state = tr.optimizer.init(params)
        from fine_grained_gaussian_process_forcasting_tpu.train.trainer import (
            TrainState,
        )

        state = TrainState(params=params, opt_state=opt_state, rng=rng)
        state, loss, mse = tr.train_epoch(state, data)
        np.testing.assert_allclose(ms_loss[i], loss, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(ms_mse[i], mse, rtol=1e-5, atol=1e-5)
        got = jax.tree_util.tree_leaves(ms.seed_params(ms_state, i))
        want = jax.tree_util.tree_leaves(state.params)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


def test_multiseed_eval_and_divergence():
    """Replicas with different seeds actually diverge, and eval returns
    per-seed metrics."""
    model = _model(gp=False, denoise=False)
    data = _data()
    ms = MultiSeedTrainer(model, d_model=8, n_seeds=3)
    state = ms.init_state([1, 2, 3], np.asarray(data[0][0]),
                          np.asarray(data[1][0]), np.asarray(data[2][0]))
    state, loss, mse = ms.train_epoch(state, data)
    assert loss.shape == (3,)
    assert len({round(float(x), 6) for x in loss}) == 3  # distinct replicas
    eloss, emse, preds = ms.eval_epoch(state, data)
    assert eloss.shape == (3,) and emse.shape == (3,)
    assert preds.shape[:2] == (3, 3) or preds.shape[1] == 3  # (nb, seeds, ...)


def test_multiseed_harness_matches_sequential_harness(tmp_path):
    """MultiSeedExperimentHarness == N sequential ExperimentHarness runs
    (same per-seed keys -> same eval MSE), with per-seed artifacts."""
    import os

    from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
        make_synthetic_frame,
    )
    from fine_grained_gaussian_process_forcasting_tpu.data.window import (
        BatchedSplit,
    )
    from fine_grained_gaussian_process_forcasting_tpu.train.harness import (
        ExperimentHarness,
        HarnessArgs,
        MultiSeedExperimentHarness,
    )

    raw = make_synthetic_frame("solar", num_entities=3, steps_per_entity=500,
                               seed=1)
    seeds = [11, 23]

    def shrink(split, n=2, bs=16):
        return BatchedSplit(enc=split.enc[:n, :bs], dec=split.dec[:n, :bs],
                            y=split.y[:n, :bs])

    def make_args(seed, sub):
        return HarnessArgs(
            exp_name="solar", model_name="ATA_ms", attn_type="basic",
            pred_len=24, seed=seed, n_trials=1, num_epochs=2,
            denoising=True, gp=True, num_inducing=8,
            out_dir=str(tmp_path / sub),
            d_model_choices=(16,), stack_choices=(1,),
            w_steps_choices=(100,),
        )

    ms = MultiSeedExperimentHarness(raw, make_args(seeds[0], "ms"),
                                    seeds=seeds)
    ms.train_data = shrink(ms.train_data)
    ms.valid_data = shrink(ms.valid_data)
    ms.test_data = shrink(ms.test_data)
    ms.run_study()
    ms_results = ms.evaluate()
    assert len(ms_results) == 2

    for i, seed in enumerate(seeds):
        single = ExperimentHarness(raw, make_args(seed, f"seq{seed}"))
        single.train_data = shrink(single.train_data)
        single.valid_data = shrink(single.valid_data)
        single.test_data = shrink(single.test_data)
        single.run_study()
        res = single.evaluate()
        np.testing.assert_allclose(ms_results[i]["mse"], res["mse"],
                                   rtol=2e-4, atol=2e-5)
        # per-seed checkpoint + curves on disk
        name = ms._name_for_seed(seed)
        assert any(name in e.name for e in
                   os.scandir(os.path.join(str(tmp_path / "ms"),
                                           "models_solar_24")))
        assert os.path.exists(os.path.join(
            str(tmp_path / "ms"), "losses_lists",
            f"{name}_mse_losses_valid.npy"))

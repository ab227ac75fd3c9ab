"""Inference-session tests: checkpoint -> predictor -> unscaled forecasts."""

import jax
import numpy as np

from fine_grained_gaussian_process_forcasting_tpu.data.experiment import (
    ExperimentConfig,
)
from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)
from fine_grained_gaussian_process_forcasting_tpu.models import (
    ForecastDenoising,
)
from fine_grained_gaussian_process_forcasting_tpu.train.checkpoint import (
    save_checkpoint,
)
from fine_grained_gaussian_process_forcasting_tpu.train.predict import (
    InferenceSession,
)


def test_inference_session_end_to_end(tmp_path):
    pred_len = 24
    config = ExperimentConfig(pred_len, "electricity",
                              root_folder=str(tmp_path / "outputs"))
    formatter = config.make_data_formatter()
    raw = make_synthetic_frame("electricity", num_entities=2,
                               steps_per_entity=400, seed=9)

    model = ForecastDenoising(
        src_input_size=4, tgt_input_size=4, d_model=16, n_heads=4, d_k=4,
        stack_size=1, pred_len=pred_len, attn_type="basic", gp=True,
        denoise=True, num_inducing=8,
    )
    rng = jax.random.PRNGKey(0)
    enc0 = np.zeros((2, 192, 4), np.float32)
    dec0 = np.zeros((2, 24, 4), np.float32)
    variables = model.init({"params": rng, "noise": rng, "sampling": rng},
                           enc0, dec0)
    save_checkpoint(str(tmp_path), "m", variables["params"])

    session = InferenceSession.from_checkpoint(
        model, str(tmp_path), "m", jax.device_get(variables["params"]),
        batch_size=16)

    # window-level prediction with a non-multiple batch
    enc = np.random.default_rng(0).normal(size=(37, 192, 4)).astype(np.float32)
    dec = np.random.default_rng(1).normal(size=(37, 24, 4)).astype(np.float32)
    out = session.predict(enc, dec)
    assert out.shape == (37, pred_len, 1)
    assert np.all(np.isfinite(out))

    # dataframe-level: original-scale output via format_predictions
    result = session.predict_dataframe(raw, formatter, pred_len,
                                       max_windows=8)
    assert result is not None
    assert "identifier" in result.columns
    assert "t+1" in result.columns
    assert len(result) == 8
    # unscaled predictions should live near the raw target's range, not the
    # z-scored range
    raw_mean = raw["power_usage"].mean()
    assert abs(result["t+1"].mean() - raw_mean) < 3 * raw["power_usage"].std()


def test_export_serving_round_trip(tmp_path):
    """export_serving -> load_exported reproduces session.predict exactly,
    with params embedded (no model code / params needed at load)."""
    pred_len = 8
    model = ForecastDenoising(
        src_input_size=4, tgt_input_size=4, d_model=16, n_heads=4, d_k=4,
        stack_size=1, pred_len=pred_len, attn_type="basic", gp=True,
        denoise=True, num_inducing=8,
    )
    rng = jax.random.PRNGKey(0)
    enc0 = np.zeros((2, 48, 4), np.float32)
    dec0 = np.zeros((2, 8, 4), np.float32)
    variables = model.init({"params": rng, "noise": rng, "sampling": rng},
                           enc0, dec0)
    session = InferenceSession(model, variables["params"], batch_size=4)

    path = session.export_serving(
        str(tmp_path / "serving.stablehlo"), enc_len=48, dec_len=8,
        n_features=4)

    enc = np.random.default_rng(2).normal(size=(4, 48, 4)).astype(np.float32)
    dec = np.random.default_rng(3).normal(size=(4, 8, 4)).astype(np.float32)
    want = session.predict(enc, dec)

    served = InferenceSession.load_exported(path)
    got = np.asarray(served(enc, dec))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    # the artifact is self-contained: bytes on disk, loadable fresh
    assert (tmp_path / "serving.stablehlo").stat().st_size > 1000


def test_export_serving_int8_round_trip(tmp_path):
    """The int8-quantized session exports too: the artifact embeds the
    int8 weights + dequant math and reproduces the session's output."""
    pred_len = 8
    model = ForecastDenoising(
        src_input_size=4, tgt_input_size=4, d_model=16, n_heads=4, d_k=4,
        stack_size=1, pred_len=pred_len, attn_type="basic", gp=True,
        denoise=True, num_inducing=8,
    )
    rng = jax.random.PRNGKey(0)
    enc0 = np.zeros((2, 48, 4), np.float32)
    dec0 = np.zeros((2, 8, 4), np.float32)
    variables = model.init({"params": rng, "noise": rng, "sampling": rng},
                           enc0, dec0)
    session = InferenceSession(model, variables["params"], batch_size=4,
                               quantize="int8")
    path = session.export_serving(
        str(tmp_path / "serving_int8.stablehlo"), enc_len=48, dec_len=8,
        n_features=4)
    enc = np.random.default_rng(7).normal(size=(4, 48, 4)).astype(np.float32)
    dec = np.random.default_rng(8).normal(size=(4, 8, 4)).astype(np.float32)
    want = session.predict(enc, dec)
    got = np.asarray(InferenceSession.load_exported(path)(enc, dec))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

"""Serving walkthrough: train -> checkpoint -> predictor -> export.

The deployment path a production user follows after training (no
reference equivalent — the reference stops at torch.save):

1. train a small AutoDG on (synthetic) solar and checkpoint it,
2. load it into an ``InferenceSession`` (one fixed-shape compiled
   forward, tail-batch padding),
3. produce original-scale dataframe forecasts,
4. optionally quantize the Dense projections to int8,
5. export a self-contained StableHLO artifact and reload it without the
   framework's model code.

    python examples/serve_example.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

PRED_LEN = 24
ENC_LEN, DEC_LEN, N_FEATURES = 192, PRED_LEN, 5  # solar windows: 5 inputs


def main():
    out_dir = tempfile.mkdtemp(prefix="fgp_serve_")
    config = ExperimentConfig(PRED_LEN, "solar",
                              root_folder=os.path.join(out_dir, "outputs"))
    formatter = config.make_data_formatter()
    raw = make_synthetic_frame("solar", num_entities=4,
                               steps_per_entity=800, seed=0)

    # 1. a trained checkpoint (init-only here; swap in a real study's
    #    best checkpoint via InferenceSession.from_checkpoint)
    model = ForecastDenoising(
        src_input_size=N_FEATURES, tgt_input_size=N_FEATURES, d_model=32,
        n_heads=8, d_k=4, stack_size=1, pred_len=PRED_LEN,
        attn_type="autoformer", gp=True, denoise=True, num_inducing=64)
    rng = jax.random.PRNGKey(0)
    enc0 = np.zeros((2, ENC_LEN, N_FEATURES), np.float32)
    dec0 = np.zeros((2, DEC_LEN, N_FEATURES), np.float32)
    variables = model.init({"params": rng, "noise": rng, "sampling": rng},
                           enc0, dec0)
    save_checkpoint(out_dir, "AutoDG_demo", variables["params"])

    # 2. serving session (one compiled shape)
    session = InferenceSession.from_checkpoint(
        model, out_dir, "AutoDG_demo",
        jax.device_get(variables["params"]), batch_size=64)

    # 3. original-scale forecasts straight from a raw dataframe
    frame = session.predict_dataframe(raw, formatter, PRED_LEN,
                                      max_windows=128)
    print(f"forecast frame: {frame.shape[0]} windows x "
          f"{frame.shape[1] - 1} horizon steps")
    print(frame.head(3).to_string(max_cols=6))

    # 4. int8 post-training quantization (weights 4x smaller)
    q_session = InferenceSession(model, variables["params"], batch_size=64,
                                 quantize="int8")
    enc = np.random.default_rng(1).normal(
        size=(64, ENC_LEN, N_FEATURES)).astype(np.float32)
    dec = np.random.default_rng(2).normal(
        size=(64, DEC_LEN, N_FEATURES)).astype(np.float32)
    drift = np.mean(np.abs(q_session.predict(enc, dec)
                           - session.predict(enc, dec)))
    print(f"int8 vs fp32 mean |delta|: {drift:.5f}")

    # 5. self-contained artifact: load and run with zero model code
    path = session.export_serving(
        os.path.join(out_dir, "autodg.stablehlo"),
        enc_len=ENC_LEN, dec_len=DEC_LEN, n_features=N_FEATURES)
    served = InferenceSession.load_exported(path)
    delta = np.max(np.abs(np.asarray(served(enc, dec))
                          - session.predict(enc, dec)))
    # on TPU the two separate compilations may fuse the default-precision
    # (bf16-input) matmuls differently -> ~1e-2 absolute (~0.25% relative)
    # deltas; on CPU the round trip is exact (tests/test_predict.py)
    print(f"exported artifact: {os.path.getsize(path)} bytes, "
          f"max |delta| vs session: {delta:.2e}")
    print(f"artifacts in {out_dir}")


if __name__ == "__main__":
    main()

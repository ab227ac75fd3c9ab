"""Inference session: checkpoint -> jitted batch predictor -> unscaled
predictions.

The serving-side counterpart of the training harness: loads an orbax
checkpoint, compiles one fixed-shape forward, and exposes window-level and
dataframe-level prediction.  ``predict_dataframe`` runs the full
production path: formatter scaling -> window extraction -> batched device
inference -> per-entity inverse target scaling
(``format_predictions``, reference ``data/electricity.py:176-212``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from fine_grained_gaussian_process_forcasting_tpu.models.forecast_denoising import (
    ForecastDenoising,
)
from fine_grained_gaussian_process_forcasting_tpu.train.checkpoint import (
    load_checkpoint,
)


class InferenceSession:
    def __init__(self, model: ForecastDenoising, params,
                 batch_size: int = 256, quantize: Optional[str] = None):
        """``quantize='int8'`` serves every Dense projection through the
        int8 MXU path (weight-per-channel / activation-per-token dynamic
        PTQ, ``train/quantize.py``) — ~2x the bf16 GEMM rate on v5e; the
        GP stack, normalization and correlation math stay fp32."""
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize={quantize!r} (None or 'int8')")
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self.quantize = quantize

        from fine_grained_gaussian_process_forcasting_tpu.train.quantize import (
            build_qparams,
            quantized_apply,
        )

        # weights quantize ONCE per session; the serving jit receives the
        # int8 copies as inputs and its unused fp32 Dense kernels are
        # dead-code-eliminated from the executable (the 4x footprint win)
        qmap = build_qparams(params) if quantize == "int8" else {}
        box = {}

        @jax.jit
        def _forward(params, qmap, enc, dec):
            box["qmap"] = qmap  # traced map, read by the interceptor
            with quantized_apply(quantize, lambda: box["qmap"]):
                out = model.apply(
                    {"params": params}, enc, dec, training=False,
                    rngs={"noise": jax.random.PRNGKey(0),
                          "sampling": jax.random.PRNGKey(1)})
            return out.predictions

        self._qmap = qmap
        self._forward = lambda params, enc, dec: _forward(
            params, qmap, enc, dec)

    @classmethod
    def from_checkpoint(cls, model: ForecastDenoising, model_path: str,
                        model_name: str, template_params,
                        batch_size: int = 256,
                        quantize: Optional[str] = None) -> "InferenceSession":
        payload = load_checkpoint(model_path, model_name,
                                  template={"params": template_params})
        return cls(model, payload["params"], batch_size, quantize=quantize)

    def predict(self, enc: np.ndarray, dec: np.ndarray) -> np.ndarray:
        """(N, enc_len, F), (N, dec_len, F) -> (N, pred_len, 1); pads the
        tail batch so one compiled shape serves any N."""
        n = enc.shape[0]
        bs = self.batch_size
        outs = []
        for i in range(0, n, bs):
            e, d = enc[i : i + bs], dec[i : i + bs]
            pad = bs - e.shape[0]
            if pad:
                e = np.concatenate([e, np.repeat(e[-1:], pad, 0)], 0)
                d = np.concatenate([d, np.repeat(d[-1:], pad, 0)], 0)
            p = np.asarray(self._forward(self.params, jnp.asarray(e),
                                         jnp.asarray(d)))
            outs.append(p[: bs - pad] if pad else p)
        return np.concatenate(outs, 0)

    def export_serving(self, path: str, enc_len: int, dec_len: int,
                       n_features: int, platforms=None) -> str:
        """Serialize the serving forward to a self-contained StableHLO
        artifact (``jax.export``): params (and int8 weights, if
        quantized) are embedded as constants, so the file can be loaded
        and executed by any JAX runtime of the same platform — TPU pods,
        a serving binary, a different process — **without this framework
        or the model code installed**.  The deployment hand-off the
        reference's pickle-a-torch-module checkpoints cannot provide
        (``train.py:186-187`` requires the full source tree at load).

        Shapes are fixed at (batch_size, enc_len/dec_len, n_features) —
        the same one-compiled-shape contract ``predict`` serves through.
        Returns ``path``.
        """
        from jax import export as jexport

        params, forward = self.params, self._forward  # qmap closed over

        def serving(enc, dec):
            return forward(params, enc, dec)

        b = self.batch_size
        specs = (
            jax.ShapeDtypeStruct((b, enc_len, n_features), jnp.float32),
            jax.ShapeDtypeStruct((b, dec_len, n_features), jnp.float32),
        )
        kwargs = {"platforms": platforms} if platforms else {}
        exported = jexport.export(jax.jit(serving), **kwargs)(*specs)
        data = exported.serialize()
        with open(path, "wb") as f:
            f.write(data)
        return path

    @staticmethod
    def load_exported(path: str):
        """Load an ``export_serving`` artifact -> callable (enc, dec) ->
        predictions.  Needs only jax — no model code, no params."""
        from jax import export as jexport

        with open(path, "rb") as f:
            exported = jexport.deserialize(f.read())
        return lambda enc, dec: exported.call(jnp.asarray(enc),
                                              jnp.asarray(dec))

    def predict_dataframe(self, raw_df: pd.DataFrame, formatter,
                          pred_len: int,
                          max_windows: Optional[int] = 1024) -> pd.DataFrame:
        """Raw dataframe -> per-window forecasts in the ORIGINAL scale.

        Returns a frame with columns [identifier, t+1 .. t+pred_len].
        """
        from fine_grained_gaussian_process_forcasting_tpu.data.window import (
            sample_windows,
        )

        params_exp = formatter.get_experiment_params()
        data = formatter.transform_data(raw_df)
        time_col = [t[0] for t in params_exp["column_definition"]
                    if t[2].name == "TIME"][0]
        id_col = [t[0] for t in params_exp["column_definition"]
                  if t[2].name == "ID"][0]
        data = data.sort_values(by=[id_col, time_col])

        rng_state = np.random.get_state()
        np.random.seed(2436)
        try:
            split = sample_windows(
                data, max_windows or 0, params_exp["total_time_steps"],
                params_exp["num_encoder_steps"], pred_len,
                params_exp["column_definition"], pad_incomplete=False)
        finally:
            np.random.set_state(rng_state)

        preds = self.predict(split.enc_inputs, split.dec_inputs)[..., 0]
        frame = pd.DataFrame(
            preds, columns=[f"t+{i + 1}" for i in range(pred_len)])
        frame["identifier"] = split.identifiers[: len(frame)]
        return formatter.format_predictions(frame)

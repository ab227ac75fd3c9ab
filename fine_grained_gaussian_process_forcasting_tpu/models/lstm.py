"""LSTM forecasting backbone.

Equivalent of the reference's ``forecasting_models/LSTM.py:7-26``.  Note the
reference's LSTM path is doubly broken (constructor called with kwargs the
class doesn't accept, ``forecast_denoising.py:35-41``, and ``forward``
called with two inputs while accepting one) — this build fixes the
capability: the LSTM consumes the embedded encoder and decoder streams as
one sequence and returns (enc_out, dec_out) hidden states, making it a
drop-in backbone for the composite.

Implemented with ``nn.scan``-wrapped ``OptimizedLSTMCell`` so the recurrence
compiles to a single fused XLA while-loop.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class LSTMBackbone(nn.Module):
    hidden_size: int
    n_layers: int = 1

    @nn.compact
    def __call__(self, enc_inputs, dec_inputs,
                 training: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = jnp.concatenate([enc_inputs, dec_inputs], axis=1)  # (b, L, d)
        b = x.shape[0]
        for i in range(self.n_layers):
            cell = nn.OptimizedLSTMCell(self.hidden_size, name=f"lstm{i}")
            scan = nn.RNN(cell, name=f"rnn{i}")
            x = scan(x)
        enc_len = enc_inputs.shape[1]
        return x[:, :enc_len], x[:, enc_len:]

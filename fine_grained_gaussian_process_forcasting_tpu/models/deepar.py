"""DeepAR: autoregressive LSTM emitting per-step Gaussians.

Re-design of ``forecasting_models/DeepAR.py:14-246``.  The reference
processes the window through an LSTM and regresses (mu, softplus sigma)
from the hidden state; training minimizes Gaussian NLL (``loss_fn``,
``DeepAR.py:116-128``); prediction runs ancestral sampling over the
horizon (``Net.test``, ``DeepAR.py:82-114``).

The reference's harness actually feeds the (batch, time, 1) window into a
non-batch-first LSTM in one call (``baselines.py:171-175``), which
transposes batch and time; here the *intended* model is implemented: per
step t, the input is z_{t-1}; mu_t/sigma_t come from the step's hidden
state.  The recurrence is ``nn.RNN``-scanned; ancestral sampling is a
``lax.scan`` (SURVEY.md section 7 step 6).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DeepAR(nn.Module):
    embedding_dim: int = 32
    hidden_dim: int = 32
    n_layers: int = 1

    def setup(self):
        self.embedding = nn.Dense(self.embedding_dim)
        self.rnns = [
            nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim), return_carry=True,
                   name=f"rnn{i}")
            for i in range(self.n_layers)
        ]
        self.distribution_mu = nn.Dense(1)
        self.distribution_presigma = nn.Dense(1)

    def _run(self, h):
        """h: (b, l, e) -> (carries, per-layer hidden concat (b, l, H*n))."""
        carries, outs = [], []
        for rnn in self.rnns:
            carry, h = rnn(h)
            carries.append(carry)
            outs.append(h)
        return carries, jnp.concatenate(outs, axis=-1)

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Teacher-forced pass. x: (b, l, 1) -> (mu, sigma) each (b, l).

        All layers' hidden states drive the heads (``DeepAR.py:69-73``).
        """
        _, feat = self._run(self.embedding(x))
        mu = self.distribution_mu(feat)[..., 0]
        sigma = jax.nn.softplus(self.distribution_presigma(feat)[..., 0])
        return mu, sigma

    def sample(
        self,
        history: jnp.ndarray,
        pred_len: int,
        rng: jax.Array,
        n_samples: int = 1,
    ) -> jnp.ndarray:
        """Ancestral sampling (``Net.test`` with sampling=True).

        history: (b, l, 1) observed prefix; returns (n_samples, b, pred_len).
        Call via ``module.apply(variables, ..., method='sample')``.
        """

        def one_sample(key):
            carries, _ = self._run(self.embedding(history))
            last = history[:, -1, :]

            def step(state, key_t):
                carries, prev = state
                h_t = self.embedding(prev)[:, None, :]
                new_carries, outs = [], []
                for rnn, carry in zip(self.rnns, carries):
                    carry, h_t = rnn(h_t, initial_carry=carry)
                    new_carries.append(carry)
                    outs.append(h_t)
                feat_t = jnp.concatenate(outs, axis=-1)[:, 0]
                mu = self.distribution_mu(feat_t)[..., 0]
                sigma = jax.nn.softplus(
                    self.distribution_presigma(feat_t)[..., 0])
                z = mu + sigma * jax.random.normal(key_t, mu.shape)
                return (new_carries, z[..., None]), z

            keys = jax.random.split(key, pred_len)
            (_, _), zs = jax.lax.scan(step, (carries, last), keys)
            return zs.transpose(1, 0)  # (b, pred_len)

        keys = jax.random.split(rng, n_samples)
        return jnp.stack([one_sample(k) for k in keys])


def deepar_nll(mu: jnp.ndarray, sigma: jnp.ndarray, labels: jnp.ndarray):
    """Gaussian negative log likelihood (``DeepAR.py:116-128``)."""
    var = sigma**2
    logp = -0.5 * (jnp.log(2 * jnp.pi * var) + (labels - mu) ** 2 / var)
    return -jnp.mean(logp)


def accuracy_nd(mu: jnp.ndarray, labels: jnp.ndarray):
    """ND metric pieces (``DeepAR.py:131-140``): (sum |err|, sum |labels|)
    over nonzero labels."""
    mask = labels != 0
    diff = jnp.sum(jnp.abs(mu - labels) * mask)
    summation = jnp.sum(jnp.abs(labels) * mask)
    return diff, summation


def accuracy_rmse(mu: jnp.ndarray, labels: jnp.ndarray):
    """RMSE metric pieces (``DeepAR.py:143-155``)."""
    mask = labels != 0
    diff = jnp.sum(((mu - labels) * mask) ** 2)
    summation = jnp.sum(jnp.abs(labels) * mask)
    count = jnp.sum(mask)
    return diff, summation, count

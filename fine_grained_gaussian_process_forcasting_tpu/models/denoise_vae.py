"""Legacy VAE-style denoiser (unused by the main path, kept for parity).

Re-design of ``denoising_model/denoising_model.py:10-108``: conv
encoder/decoder with a reparameterized latent, optional exact-GP-prior
blur of the input, and a diagonal-Gaussian KL against GP moments of the
target.  The reference's gpytorch prior moments (ConstantMean +
ScaleKernel(RBF) *prior*, not posterior) reduce to a constant mean and the
outputscale as variance — computed here in closed form.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fine_grained_gaussian_process_forcasting_tpu.gp.kernels import softplus
from fine_grained_gaussian_process_forcasting_tpu.models.losses import normal_kl


class _ConvStack(nn.Module):
    d: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.d, (3,), padding="SAME", name="conv1")(x)
        y = nn.Conv(self.d, (3,), padding="SAME", name="conv2")(y)
        # BatchNorm with batch stats (see ops.conv_attention.BatchStatsNorm)
        from fine_grained_gaussian_process_forcasting_tpu.ops.conv_attention import (
            BatchStatsNorm,
        )

        y = BatchStatsNorm(name="bn")(y)
        return jax.nn.softmax(y, axis=1)  # softmax over time (torch dim=-1
        # acted on the (b, d, l) layout => the time axis)


class DenoiseVAE(nn.Module):
    d: int
    gp: bool = False
    n_noise: bool = False
    residual: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        target: Optional[jnp.ndarray] = None,
        residual: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = self.d
        if self.has_rng("noise"):
            rng = self.make_rng("noise")
        else:
            rng = jax.random.PRNGKey(0)
        r1, r2 = jax.random.split(rng)
        eps = jax.random.normal(r1, x.shape, x.dtype)

        if self.gp:
            # GP *prior* moments of x under ConstantMean + ScaleKernel(RBF):
            # mean = c, var = outputscale (``denoising_model.py:63-71``)
            c = self.param("prior_mean", nn.initializers.zeros, ())
            raw_os = self.param("raw_outputscale", nn.initializers.zeros, ())
            mean = jnp.full(x.shape[:2] + (1,), c)
            var = jnp.full(x.shape[:2] + (1,), softplus(raw_os))
            proj_mean = nn.Dense(d, name="gp_proj_mean")(mean)
            proj_var = nn.Dense(d, name="gp_proj_var")(var)
            x_noisy = x + proj_mean + proj_var * eps * 0.1
        elif self.n_noise:
            x_noisy = x
        elif self.residual and residual is not None:
            x_noisy = residual
        else:
            x_noisy = x + eps * 0.05

        h = _ConvStack(d, name="encoder")(x_noisy)
        musig = nn.Dense(2 * d, name="musig")(h)
        mu, sigma = musig[..., :d], musig[..., d:]
        z = mu + jnp.exp(sigma * 0.5) * jax.random.normal(r2, sigma.shape)
        y = _ConvStack(d, name="decoder")(z)
        output = nn.LayerNorm(epsilon=1e-5, name="norm")(y + x)

        kl_loss = jnp.zeros(())
        if target is not None:
            s_len = target.shape[1]
            ct = self.param("prior_mean_t", nn.initializers.zeros, ())
            raw_os_t = self.param("raw_outputscale_t", nn.initializers.zeros, ())
            mean_t = jnp.full(target.shape[:2], ct)
            var_t = jnp.full(target.shape[:2], softplus(raw_os_t))
            mu_s = jnp.mean(mu[:, -s_len:, :], axis=-1)
            sig_s = jnp.mean(sigma[:, -s_len:, :], axis=-1)
            kl_loss = normal_kl(mean_t, var_t, mu_s, sig_s).mean()
        return output, kl_loss

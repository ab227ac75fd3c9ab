"""Pure-torch reimplementation of the reference's gpytorch blur stack.

The environment has torch but NOT gpytorch, so the reference's actual GP
path (``/root/reference/denoising_model/DeepGP.py:14-98`` +
``forecast_denoising.py:81-105``) cannot be imported.  This module
re-implements the exact math of the gpytorch objects the reference uses so
the FULL forecast->GP-blur->denoise->joint-ELBO path can be trained
head-to-head against this framework (tests/test_reference_parity.py::
test_end_to_end_gp_training_parity and scripts/ablation_torch_side.py):

- ``ToyDeepGPHiddenLayer`` (``DeepGP.py:14-74``, mean_type='linear'):
  whitened ``VariationalStrategy`` with learned inducing locations,
  ``MeanFieldVariationalDistribution`` (variational mean zeros, raw stddev
  ones with abs() constraint — gpytorch's parametrization),
  ``ScaleKernel(RBFKernel(ard_num_dims=d))`` (softplus raw params, zeros
  init), ``LinearMean`` (randn weights/bias).
- ``GaussianLikelihood``: noise = softplus(raw) + 1e-4 (GreaterThan(1e-4)
  constraint transform).
- ``DeepApproximateMLL(VariationalELBO(lik, gp, num_data=d_model))``
  arithmetic (``forecast_denoising.py:86-89``): mean-over-points expected
  log prob minus KL/num_data, then mean over the sample+batch dims
  (num_likelihood_samples pinned to 1 by the reference, ``train.py:20``).

Whitened-strategy math (equivalently ``gpytorch/variational/
variational_strategy.py``):

    Kzz = k(Z,Z) + jitter*I,  L = chol(Kzz),  A = L^-1 k(Z, x)
    E[f]   = mu(x) + A^T m
    Var[f] = k(x,x) - sum_M A^2 + sum_M (s*A)^2       (diagonal)
    KL(q(u)||N(0,I)) = 0.5 sum_M (s^2 + m^2 - 1 - 2 log s)

This file is a VERIFICATION ARTIFACT (the reference side of parity tests),
not part of the framework; the framework itself never imports torch.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn

_JITTER = 1e-4
_NOISE_LOWER = 1e-4


class TorchWhitenedGP(nn.Module):
    """One whitened mean-field variational GP layer with LinearMean +
    GaussianLikelihood — the math of the reference's shipped ``DeepGPp``
    (single hidden layer, output_dims=None, ``DeepGP.py:76-98``)."""

    def __init__(self, input_dims: int, num_inducing: int = 256):
        super().__init__()
        d, m = input_dims, num_inducing
        self.inducing_points = nn.Parameter(torch.randn(m, d))
        self.variational_mean = nn.Parameter(torch.zeros(m))
        # gpytorch MeanFieldVariationalDistribution keeps a raw stddev
        # initialized to ones; the constraint is abs() (not exp/softplus)
        self._variational_stddev = nn.Parameter(torch.ones(m))
        self.raw_lengthscale = nn.Parameter(torch.zeros(d))
        self.raw_outputscale = nn.Parameter(torch.zeros(()))
        # LinearMean: weights/bias ~ randn (gpytorch/means/linear_mean.py)
        self.mean_weights = nn.Parameter(torch.randn(d))
        self.mean_bias = nn.Parameter(torch.randn(()))
        self.raw_noise = nn.Parameter(torch.zeros(()))
        self.num_inducing = m

    @property
    def noise(self) -> torch.Tensor:
        return torch.nn.functional.softplus(self.raw_noise) + _NOISE_LOWER

    def marginals(self, x: torch.Tensor):
        """x: (..., N, d) -> per-point posterior (mean, var), each (..., N),
        and the layer's scalar KL."""
        m = self.num_inducing
        ls = torch.nn.functional.softplus(self.raw_lengthscale)
        os_ = torch.nn.functional.softplus(self.raw_outputscale)
        zs = self.inducing_points / ls
        xs = x / ls

        z2 = (zs * zs).sum(-1)
        d2zz = z2[:, None] + z2[None, :] - 2.0 * zs @ zs.T
        kzz = os_ * torch.exp(-0.5 * d2zz.clamp_min(0.0)) \
            + _JITTER * torch.eye(m, dtype=x.dtype)
        chol = torch.linalg.cholesky(kzz)

        x2 = (xs * xs).sum(-1)  # (..., N)
        d2zx = z2.reshape(*([1] * (x.dim() - 2)), m, 1) \
            + x2.unsqueeze(-2) - 2.0 * torch.einsum("md,...nd->...mn", zs, xs)
        kzx = os_ * torch.exp(-0.5 * d2zx.clamp_min(0.0))  # (..., M, N)

        a = torch.linalg.solve_triangular(chol, kzx, upper=False)  # (...,M,N)
        mean_x = torch.einsum("...nd,d->...n", x, self.mean_weights) \
            + self.mean_bias
        mean = mean_x + torch.einsum("...mn,m->...n", a, self.variational_mean)
        s = self._variational_stddev.abs().clamp_min(1e-8)
        var = os_ - (a * a).sum(-2) \
            + ((s.reshape(*([1] * (x.dim() - 2)), m, 1) * a) ** 2).sum(-2)
        var = var.clamp_min(1e-8)
        kl = 0.5 * (s * s + self.variational_mean ** 2
                    - 1.0 - 2.0 * torch.log(s)).sum()
        return mean, var, kl

    def predict(self, x: torch.Tensor):
        """``DeepGPp.predict`` (``DeepGP.py:94-98``): the likelihood leaves
        the mean unchanged; returns the blur mean plus the marginals the
        ELBO needs.  The reference's leading num_likelihood_samples dim is
        1 (``train.py:20``) and is omitted."""
        return self.marginals(x)


def variational_elbo(mean: torch.Tensor, var: torch.Tensor,
                     kl: torch.Tensor, noise: torch.Tensor,
                     target: torch.Tensor, num_data: int) -> torch.Tensor:
    """``DeepApproximateMLL(VariationalELBO(lik, gp, num_data))`` applied as
    the reference does (``forecast_denoising.py:86-89``): expected log prob
    summed over the event dim and divided by it (== mean over points),
    minus KL/num_data, then mean over batch (the reference's trailing
    ``.mean()``)."""
    ell = -0.5 * (((target - mean) ** 2 + var) / noise
                  + torch.log(2.0 * math.pi * noise))
    return (ell.mean(-1) - kl / num_data).mean()


class TorchForecastDenoising(nn.Module):
    """The reference's ``Forecast_denoising`` math (``forecast_denoising
    .py:14-105`` + ``denoising_model/denoise_model_2.py:10-65``) with the
    gpytorch stack replaced by :class:`TorchWhitenedGP`, composed around
    the reference's OWN ``modules.transformer.Transformer`` (imported from
    /root/reference by the caller and passed in).

    Faithful details:
    - the denoiser IS the forecaster module (shared weights,
      ``forecast_denoising.py:57``);
    - ``proj_up`` (commented out in the reference at
      ``denoise_model_2.py:21`` — a latent AttributeError) is defined, as
      both builds must;
    - GP blur adds the posterior MEAN (``predict`` -> likelihood mean) of a
      single shared DeepGP to both streams (``denoise_model_2.py:50-51``);
    - isotropic mode adds 0.05*N(0,1) in train AND eval
      (``denoise_model_2.py:59-60``);
    - joint loss = MSE + clip(lam, 0, 0.005) * (-ELBO)
      (``forecast_denoising.py:102-104``), lam ~ N(0,1) learned;
    - the reference's unused top-level ``self.deep_gp``
      (``forecast_denoising.py:67``) receives no gradients and is omitted.
    """

    def __init__(self, forecasting_model: nn.Module, src_input_size: int,
                 tgt_input_size: int, d_model: int, pred_len: int,
                 gp: bool = True, denoise: bool = True,
                 no_noise: bool = False, num_inducing: int = 256):
        super().__init__()
        self.forecasting_model = forecasting_model
        self.enc_embedding = nn.Linear(src_input_size, d_model)
        self.dec_embedding = nn.Linear(tgt_input_size, d_model)
        self.final_projection = nn.Linear(d_model, 1)
        self.deep_gp = TorchWhitenedGP(d_model, num_inducing)
        self.proj_up = nn.Linear(1, d_model)
        self.lam = nn.Parameter(torch.randn(1))
        self.pred_len = pred_len
        self.d = d_model
        self.gp = gp
        self.denoise = denoise
        self.no_noise = no_noise

    def forward(self, enc_inputs, dec_inputs, y_true=None):
        mll_error = torch.zeros(())
        enc = self.enc_embedding(enc_inputs)
        dec = self.dec_embedding(dec_inputs)
        enc_out, dec_out = self.forecasting_model(enc, dec)
        forecast = self.final_projection(dec_out[:, -self.pred_len:, :])

        if self.denoise:
            if self.gp:
                m_e, _, _ = self.deep_gp.predict(enc_out)
                m_d, v_d, kl = self.deep_gp.predict(dec_out)
                enc_noisy = enc_out + self.proj_up(m_e.unsqueeze(-1))
                dec_noisy = dec_out + self.proj_up(m_d.unsqueeze(-1))
            elif self.no_noise:
                enc_noisy, dec_noisy = enc_out, dec_out
            else:  # isotropic, active in train and eval like the reference
                enc_noisy = enc_out + 0.05 * torch.randn_like(enc_out)
                dec_noisy = dec_out + 0.05 * torch.randn_like(dec_out)
            _, dec_rec = self.forecasting_model(enc_noisy, dec_noisy)
            final = self.final_projection(
                (dec_out + dec_rec)[:, -self.pred_len:, :])
            if self.gp and self.training and y_true is not None:
                # mll(dist, y_true.permute(2,0,1)): dec_len == pred_len in
                # every reference configuration
                tgt = y_true[..., 0]
                mll_error = -variational_elbo(
                    m_d[:, -self.pred_len:], v_d[:, -self.pred_len:],
                    kl, self.deep_gp.noise, tgt, num_data=self.d)
        else:
            final = forecast

        loss = torch.zeros(())
        mse = torch.zeros(())
        if y_true is not None:
            mse = torch.nn.functional.mse_loss(final, y_true)
            loss = mse + self.lam.clamp(0.0, 0.005)[0] * mll_error
        return final, loss, mse

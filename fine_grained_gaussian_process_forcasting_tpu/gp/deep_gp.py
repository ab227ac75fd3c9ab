"""Whitened variational deep GP — the core from-scratch build.

Replaces the gpytorch stack inside ``denoising_model/DeepGP.py:14-98``:
``DeepGPLayer`` + whitened ``VariationalStrategy`` with 256 learned
inducing points + ``MeanFieldVariationalDistribution`` + ``LinearMean`` +
``ScaleKernel(RBFKernel(ard_num_dims=d))`` + ``GaussianLikelihood``.

Math (whitened strategy, mean-field q(u) = N(m, diag(s^2)) over whitened
inducing values):

    Kzz = k(Z, Z) + jitter*I,  L = chol(Kzz)
    A   = L^{-1} k(Z, x)                      (M x N)
    E[f(x)]   = mu(x) + A^T m
    Var[f(x)] = k(x,x) - sum_M A^2 + sum_M (s * A)^2      (diagonal only)
    KL(q(u) || N(0, I)) = 0.5 * sum_M (s^2 + m^2 - 1 - 2 log s)

TPU-first design decisions:
- Only the *marginal* (diagonal) posterior is ever materialized — both the
  blur mean and the ELBO's expected log-likelihood need nothing else
  (``forecast_denoising.py:86-89`` uses a Gaussian likelihood), so the
  (N x N) covariance the reference's MultivariateNormal carries is never
  formed.
- The triangular solve is replaced by one explicit (M x M) inverse of L
  followed by a plain matmul: for M=256 the inverse is negligible and the
  matmul runs on the MXU, where a batched triangular solve would serialize.
- Everything is fp32; the exp/matmul pipeline is fusable by XLA, with a
  fused Pallas kernel available for the cross-covariance.

The leading ``num_likelihood_samples`` dim of gpytorch (pinned to 1 by the
reference, ``train.py:20``) is identity here and omitted.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fine_grained_gaussian_process_forcasting_tpu.gp.kernels import rbf_ard, softplus

_JITTER = 1e-4  # gpytorch's float32 cholesky jitter scale
_NOISE_FLOOR = 1e-4  # gpytorch GaussianLikelihood GreaterThan(1e-4) constraint


class GPPosterior(NamedTuple):
    """Marginal posterior q(f) plus the layer's variational bookkeeping.

    ``mean``/``var``: (..., N) marginals at the input points.
    ``kl``: scalar KL(q(u)||p(u)) of the layer's inducing values.
    ``noise``: the Gaussian likelihood's noise variance (constrained).
    """

    mean: jnp.ndarray
    var: jnp.ndarray
    kl: jnp.ndarray
    noise: jnp.ndarray


class DeepGP(nn.Module):
    """Single-hidden-layer deep GP with linear mean + Gaussian likelihood
    (reference ``DeepGPp``, ``DeepGP.py:76-98``: one ``ToyDeepGPHiddenLayer``
    with ``output_dims=None`` and ``mean_type='linear'``)."""

    input_dims: int
    num_inducing: int = 256
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> GPPosterior:
        """x: (..., N, d) -> marginal q(f) over the N points."""
        d, m = self.input_dims, self.num_inducing

        inducing = self.param(
            "inducing_points", nn.initializers.normal(1.0), (m, d)
        )
        var_mean = self.param("variational_mean", nn.initializers.zeros, (m,))
        var_log_std = self.param(
            "variational_log_stddev", nn.initializers.zeros, (m,)
        )
        raw_ls = self.param("raw_lengthscale", nn.initializers.zeros, (d,))
        raw_os = self.param("raw_outputscale", nn.initializers.zeros, ())
        mean_w = self.param("mean_weight", nn.initializers.normal(1.0 / d), (d,))
        mean_b = self.param("mean_bias", nn.initializers.zeros, ())
        raw_noise = self.param("raw_noise", nn.initializers.zeros, ())

        lengthscale = softplus(raw_ls)
        outputscale = softplus(raw_os)

        kzz = rbf_ard(inducing, inducing, lengthscale, outputscale)
        kzz = kzz + _JITTER * jnp.eye(m, dtype=kzz.dtype)
        chol = jnp.linalg.cholesky(kzz)
        # Explicit small inverse -> downstream solves become MXU matmuls.
        chol_inv = jax.scipy.linalg.solve_triangular(
            chol, jnp.eye(m, dtype=kzz.dtype), lower=True
        )

        if self.use_pallas:
            from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.rbf import (
                rbf_cross_kernel,
            )

            kzx = rbf_cross_kernel(x, inducing, lengthscale, outputscale)
        else:
            kzx = rbf_ard(x, inducing, lengthscale, outputscale)  # (..., N, M)
        a = jnp.einsum(
            "mk,...nk->...nm", chol_inv, kzx, preferred_element_type=jnp.float32
        )  # (..., N, M): row n holds A[:, n]^T

        mean_x = jnp.einsum("...nd,d->...n", x, mean_w) + mean_b
        mean = mean_x + a @ var_mean

        s = jnp.exp(var_log_std)
        k_diag = outputscale  # RBF: k(x,x) = outputscale
        var = k_diag - jnp.sum(a * a, axis=-1) + jnp.sum((a * s) ** 2, axis=-1)
        var = jnp.maximum(var, 1e-8)

        s2 = jnp.exp(2.0 * var_log_std)
        kl = 0.5 * jnp.sum(s2 + var_mean * var_mean - 1.0 - 2.0 * var_log_std)
        noise = softplus(raw_noise) + _NOISE_FLOOR
        return GPPosterior(mean=mean, var=var, kl=kl, noise=noise)


def gaussian_expected_log_prob(
    y: jnp.ndarray, posterior: GPPosterior
) -> jnp.ndarray:
    """E_{q(f)}[log N(y | f, noise)] per point (gpytorch
    ``GaussianLikelihood.expected_log_prob``)."""
    return -0.5 * (
        ((y - posterior.mean) ** 2 + posterior.var) / posterior.noise
        + jnp.log(2.0 * jnp.pi * posterior.noise)
    )


def variational_elbo(
    y: jnp.ndarray, posterior: GPPosterior, num_data: int
) -> jnp.ndarray:
    """gpytorch ``VariationalELBO`` + ``DeepApproximateMLL`` arithmetic
    (``forecast_denoising.py:86-89``): mean-over-points expected log
    likelihood minus KL/num_data, then mean over batch dims.

    The reference builds ``VariationalELBO(..., num_data=d_model)`` —
    num_data is the model width, not a dataset size; replicated.
    """
    ell = gaussian_expected_log_prob(y, posterior)
    # gpytorch sums over the event dim then divides by N == mean over points
    ell = jnp.mean(ell, axis=-1)
    elbo = ell - posterior.kl / num_data
    return jnp.mean(elbo)

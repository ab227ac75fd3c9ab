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

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

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


class _VariationalLayer(nn.Module):
    """One whitened mean-field variational GP layer.

    ``output_dims=None`` -> scalar GP (reference's shipped config);
    ``output_dims=h`` -> h independent batched GPs over the same inputs
    (gpytorch ``DeepGPLayer`` with a batch shape, ``DeepGP.py:21-31``).
    Returns per-point marginal (mean, var) with a trailing output-dim axis
    when batched, plus the layer KL.
    """

    input_dims: int
    output_dims: Optional[int] = None
    num_inducing: int = 256
    use_pallas: bool = False
    use_fused: bool = False  # whole-marginal fused Pallas kernel
    compute_dtype: Optional[jnp.dtype] = None  # bf16 runs the two heavy
    # GEMMs (cross-covariance inner product, whitened solve) at the MXU's
    # native rate with fp32 accumulation; params/Cholesky/exp stay fp32
    ls_init: float = 0.0  # initial LENGTHSCALE value; 0.0 = reference
    # init (raw zeros => ls ~ 0.693, gpytorch's softplus default), which
    # in d=32 makes every cross-covariance to the N(0,1) inducing points
    # ~exp(-d) ~ 0 — the GP component is born inert and (measured) never
    # trains out of it.  < 0 = 'auto': sqrt(2 d), the expected pairwise
    # distance scale, so kernels engage from step one (RESULTS.md
    # "activating the GP")

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        d, m = self.input_dims, self.num_inducing
        h = self.output_dims
        batch = (h,) if h else ()

        inducing = self.param(
            "inducing_points", nn.initializers.normal(1.0), (*batch, m, d))
        var_mean = self.param("variational_mean", nn.initializers.zeros,
                              (*batch, m))
        var_log_std = self.param(
            "variational_log_stddev", nn.initializers.zeros, (*batch, m))
        if self.ls_init == 0.0:
            ls_init_fn = nn.initializers.zeros
        else:
            ls0 = float(np.sqrt(2.0 * d)) if self.ls_init < 0 \
                else float(self.ls_init)
            raw0 = float(np.log(np.expm1(ls0)))  # softplus^-1
            ls_init_fn = nn.initializers.constant(raw0)
        raw_ls = self.param("raw_lengthscale", ls_init_fn, (*batch, d))
        raw_os = self.param("raw_outputscale", nn.initializers.zeros, batch)
        mean_w = self.param("mean_weight", nn.initializers.normal(1.0 / d),
                            (*batch, d))
        mean_b = self.param("mean_bias", nn.initializers.zeros, batch)

        def one_gp(inducing, var_mean, var_log_std, raw_ls, raw_os,
                   mean_w, mean_b):
            lengthscale = softplus(raw_ls)
            outputscale = softplus(raw_os)
            kzz = rbf_ard(inducing, inducing, lengthscale, outputscale)
            kzz = kzz + _JITTER * jnp.eye(m, dtype=kzz.dtype)
            chol = jnp.linalg.cholesky(kzz)
            # Explicit small inverse -> downstream solves become MXU matmuls.
            chol_inv = jax.scipy.linalg.solve_triangular(
                chol, jnp.eye(m, dtype=kzz.dtype), lower=True)

            if self.use_fused and not h:
                # Whole-marginal fusion: K and the whitened solve live only
                # in VMEM (ops/pallas/fused_gp.py).  With
                # W = L^-T diag(1-s^2) L^-1 and u = L^-T m the (B, N, M)
                # intermediates of the path below never touch HBM.
                from fine_grained_gaussian_process_forcasting_tpu.ops.pallas import (
                    fused_gp,
                )

                # bf16 GEMM kernel only when a 16-bit compute dtype is
                # explicitly requested; gp_compute_dtype=float32 must stay
                # on the fp32 kernel (advisor r2 finding).
                use_bf16 = (self.compute_dtype is not None
                            and jnp.dtype(self.compute_dtype).itemsize == 2)
                marginals = (fused_gp.whitened_marginals_affine_bf16
                             if use_bf16
                             else fused_gp.whitened_marginals_affine)
                s2 = jnp.exp(2.0 * var_log_std)
                u = chol_inv.T @ var_mean
                w_mat = chol_inv.T @ (chol_inv * (1.0 - s2)[:, None])
                # x goes in RAW: the 1/lengthscale scaling and the
                # LinearMean epilogue run inside the kernel (no scaled
                # (B, N, d) copy or mean GEMV in HBM — 0.41 ms of the
                # 1.04 ms flagship segment, RESULTS.md round 3)
                zsc = inducing / lengthscale
                xr = x
                squeeze = xr.ndim == 2
                if squeeze:
                    xr = xr[None]
                mean, var = marginals(
                    xr.astype(jnp.float32), zsc.astype(jnp.float32),
                    u, w_mat, outputscale, 1.0 / lengthscale, mean_w,
                    mean_b)
                if squeeze:
                    mean, var = mean[0], var[0]
                var = jnp.maximum(var, 1e-8)
                kl = 0.5 * jnp.sum(
                    s2 + var_mean * var_mean - 1.0 - 2.0 * var_log_std)
                return mean, var, kl

            if self.use_pallas:
                from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.rbf import (
                    rbf_cross_kernel,
                )

                kzx = rbf_cross_kernel(x, inducing, lengthscale, outputscale)
            else:
                kzx = rbf_ard(x, inducing, lengthscale, outputscale,
                              self.compute_dtype)
            if self.compute_dtype is not None:
                a = jnp.einsum(
                    "mk,...nk->...nm",
                    chol_inv.astype(self.compute_dtype),
                    kzx.astype(self.compute_dtype),
                    preferred_element_type=jnp.float32)
            else:
                a = jnp.einsum("mk,...nk->...nm", chol_inv, kzx,
                               preferred_element_type=jnp.float32)

            mean_x = jnp.einsum("...nd,d->...n", x, mean_w) + mean_b
            mean = mean_x + a @ var_mean
            s = jnp.exp(var_log_std)
            var = (outputscale - jnp.sum(a * a, axis=-1)
                   + jnp.sum((a * s) ** 2, axis=-1))
            var = jnp.maximum(var, 1e-8)
            s2 = jnp.exp(2.0 * var_log_std)
            kl = 0.5 * jnp.sum(
                s2 + var_mean * var_mean - 1.0 - 2.0 * var_log_std)
            return mean, var, kl

        if not h:
            return one_gp(inducing, var_mean, var_log_std, raw_ls, raw_os,
                          mean_w, mean_b)
        # batched over output dims; marginals stacked on a trailing axis
        means, vars_, kls = jax.vmap(one_gp)(
            inducing, var_mean, var_log_std, raw_ls, raw_os, mean_w, mean_b)
        move = lambda t: jnp.moveaxis(t, 0, -1)  # (..., N, h)
        return move(means), move(vars_), jnp.sum(kls)


class DeepGP(nn.Module):
    """Deep GP with linear mean + Gaussian likelihood.

    The reference's shipped config (``DeepGPp``, ``DeepGP.py:76-98``) is a
    single hidden layer with ``output_dims=None``; ``hidden_dims`` adds the
    multi-layer capability (BASELINE.json's "DeepGP multi-layer blur"):
    each hidden layer is a batch of GPs whose reparameterized samples feed
    the next layer, KL terms summing across layers.
    """

    input_dims: int
    num_inducing: int = 256
    use_pallas: bool = False
    use_fused: bool = False
    hidden_dims: Tuple[int, ...] = ()
    compute_dtype: Optional[jnp.dtype] = None
    ls_init: float = 0.0  # see _VariationalLayer.ls_init

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> GPPosterior:
        """x: (..., N, d) -> marginal q(f) over the N points."""
        raw_noise = self.param("raw_noise", nn.initializers.zeros, ())
        total_kl = jnp.zeros(())

        in_dims = self.input_dims
        for i, width in enumerate(self.hidden_dims):
            mean, var, kl = _VariationalLayer(
                input_dims=in_dims, output_dims=width,
                num_inducing=self.num_inducing, use_pallas=self.use_pallas,
                use_fused=self.use_fused,
                compute_dtype=self.compute_dtype,
                ls_init=self.ls_init,
                name=f"hidden_layer{i}",
            )(x)
            total_kl = total_kl + kl
            # reparameterized sample between layers (num_likelihood_samples=1)
            if self.has_rng("noise"):
                eps = jax.random.normal(self.make_rng("noise"), mean.shape,
                                        mean.dtype)
            else:
                eps = jnp.zeros_like(mean)
            x = mean + jnp.sqrt(var) * eps
            in_dims = width

        mean, var, kl = _VariationalLayer(
            input_dims=in_dims, output_dims=None,
            num_inducing=self.num_inducing, use_pallas=self.use_pallas,
            use_fused=self.use_fused,
            compute_dtype=self.compute_dtype,
            ls_init=self.ls_init,
            name="output_layer",
        )(x)
        total_kl = total_kl + kl
        noise = softplus(raw_noise) + _NOISE_FLOOR
        return GPPosterior(mean=mean, var=jnp.maximum(var, 1e-8),
                           kl=total_kl, noise=noise)


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

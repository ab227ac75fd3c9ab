"""Exact GP regression (O(n^3) Cholesky path).

Equivalent of the reference's (unused-by-main-path) ``ExactGPModel``
(``denoising_model/GPModel.py:4-13``): ConstantMean + ScaleKernel(RBF) +
Gaussian likelihood, with closed-form posterior and marginal log
likelihood.  Pure jittable functions over an explicit param dict.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fine_grained_gaussian_process_forcasting_tpu.gp.kernels import rbf_ard, softplus


class ExactGPParams(NamedTuple):
    raw_lengthscale: jnp.ndarray  # (d,)
    raw_outputscale: jnp.ndarray  # ()
    raw_noise: jnp.ndarray  # ()
    mean_const: jnp.ndarray  # ()


def init_exact_gp(d: int) -> ExactGPParams:
    return ExactGPParams(
        raw_lengthscale=jnp.zeros((d,)),
        raw_outputscale=jnp.zeros(()),
        raw_noise=jnp.zeros(()),
        mean_const=jnp.zeros(()),
    )


def _chol_factors(params: ExactGPParams, x: jnp.ndarray, y: jnp.ndarray):
    ls = softplus(params.raw_lengthscale)
    os_ = softplus(params.raw_outputscale)
    noise = softplus(params.raw_noise) + 1e-4
    kxx = rbf_ard(x, x, ls, os_) + noise * jnp.eye(x.shape[0])
    chol = jnp.linalg.cholesky(kxx)
    resid = y - params.mean_const
    alpha = jax.scipy.linalg.cho_solve((chol, True), resid)
    return ls, os_, chol, alpha


def exact_gp_posterior(
    params: ExactGPParams, x: jnp.ndarray, y: jnp.ndarray, x_star: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior mean and marginal variance at x_star given train (x, y)."""
    ls, os_, chol, alpha = _chol_factors(params, x, y)
    k_star = rbf_ard(x_star, x, ls, os_)  # (N*, N)
    mean = params.mean_const + k_star @ alpha
    v = jax.scipy.linalg.solve_triangular(chol, k_star.T, lower=True)
    var = os_ - jnp.sum(v * v, axis=0)
    return mean, jnp.maximum(var, 1e-8)


def exact_gp_mll(params: ExactGPParams, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Marginal log likelihood log N(y | mu, Kxx + noise*I)."""
    _, _, chol, alpha = _chol_factors(params, x, y)
    n = x.shape[0]
    resid = y - params.mean_const
    return (
        -0.5 * resid @ alpha
        - jnp.sum(jnp.log(jnp.diagonal(chol)))
        - 0.5 * n * jnp.log(2.0 * jnp.pi)
    )

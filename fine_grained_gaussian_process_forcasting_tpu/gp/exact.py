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


def psd_safe_cholesky(kxx: jnp.ndarray, max_tries: int = 3) -> jnp.ndarray:
    """Cholesky with adaptive jitter escalation — the semantics of
    gpytorch's ``psd_safe_cholesky`` the reference reaches through every
    ``ExactGP`` solve: retry with jitter growing 10x (relative to the
    mean diagonal) until the factorization is finite.  fp32 at n=384
    needs this on non-stationary data: a trained outputscale of O(100)
    with a near-constant kernel row space pushes the condition number
    past fp32's ~1e7 and a fixed 1e-4 jitter NaNs (observed: 2 of 3
    seeds of the exact-blur field run, results_r3/abl_field_exact).

    Differentiability: the escalation PROBE runs on a stop-gradient copy
    (a lax.while_loop carries no tangents, so reverse mode is legal);
    the returned factorization is ONE differentiable Cholesky at the
    probe-selected jitter."""
    import jax.lax as lax

    n = kxx.shape[0]
    scale = jnp.mean(jnp.diagonal(kxx))
    eye = jnp.eye(n, dtype=kxx.dtype)

    k0 = lax.stop_gradient(kxx)
    s0 = lax.stop_gradient(scale)

    def probe(i):
        return jnp.linalg.cholesky(k0 + (1e-4 * s0 * 10.0**i) * eye)

    def cond(state):
        i, chol = state
        return jnp.logical_and(i < max_tries,
                               ~jnp.all(jnp.isfinite(chol)))

    def body(state):
        i, _ = state
        return i + 1.0, probe(i + 1.0)

    i_sel, _ = lax.while_loop(cond, body, (0.0, probe(0.0)))
    jitter = 1e-4 * s0 * 10.0**i_sel
    return jnp.linalg.cholesky(kxx + jitter * eye)


def _chol_factors(params: ExactGPParams, x: jnp.ndarray, y: jnp.ndarray):
    ls = softplus(params.raw_lengthscale)
    os_ = softplus(params.raw_outputscale)
    noise = softplus(params.raw_noise)
    kxx = rbf_ard(x, x, ls, os_) + noise * jnp.eye(x.shape[0])
    chol = psd_safe_cholesky(kxx)
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

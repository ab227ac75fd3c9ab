"""Exact-GP blur at full sequence length — the O(n^3) stretch config.

BASELINE.json's stretch item ("exact-GP blur at full sequence length,
O(n^3) Pallas Cholesky"): instead of the 256-inducing-point variational
approximation, run an *exact* GP over each sequence's hidden states —
kernel-ridge smoothing of a learned 1-d projection:

    z   = x w + b                      (b, s)      projection
    K   = k(x, x)                      (b, s, s)   RBF-ARD over hidden dims
    m   = K (K + noise I)^{-1} z       (b, s)      posterior mean at train pts
    blur eps = proj_up(m)

and the training signal is the exact marginal log likelihood of y under
the same kernel (replacing the variational ELBO):

    mll = -0.5 (y^T A^{-1} y + log|A| + n log 2pi) / n,   A = K + noise I

The batched (b, s, s) Cholesky defaults to XLA's factorization, which
measures fastest at these sizes (see ``ops/pallas/cholesky.py`` for the
Pallas alternatives and their measured numbers).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fine_grained_gaussian_process_forcasting_tpu.gp.kernels import softplus
from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.cholesky import (
    batched_cholesky,
)

_NOISE_FLOOR = 1e-4


def _softplus_inv_init(value: float, auto: float):
    """Raw-param initializer for a softplus-constrained positive:
    0.0 = reference raw-zeros init (softplus(0) ~ 0.693), <0 = ``auto``,
    >0 = the explicit positive value (matches gp/deep_gp.py ls_init)."""
    if value == 0.0:
        return nn.initializers.zeros
    import numpy as np

    v0 = float(auto) if value < 0 else float(value)
    return nn.initializers.constant(float(np.log(np.expm1(v0))))


class ExactGPBlur(nn.Module):
    input_dims: int
    use_pallas: bool = False
    ls_init: float = 0.0  # initial lengthscale: 0 = reference raw-zeros
    # (~0.693, inert in d=32 like the variational kernel — PARITY.md),
    # <0 = auto sqrt(2 d) (the pairwise-distance scale), >0 explicit
    noise_init: float = 0.0  # initial likelihood noise: 0 = reference
    # (~0.693 — a LARGE floor that dominates K's unit outputscale),
    # >0 explicit (round-4 tuning sweep, scripts/exact_blur_sweep_r4.py)

    def setup(self):
        d = self.input_dims
        self.raw_lengthscale = self.param(
            "raw_lengthscale",
            _softplus_inv_init(self.ls_init, float(2.0 * d) ** 0.5), (d,))
        self.raw_outputscale = self.param(
            "raw_outputscale", nn.initializers.zeros, ())
        self.raw_noise = self.param(
            "raw_noise", _softplus_inv_init(self.noise_init, 0.693), ())
        self.mean_weight = self.param(
            "mean_weight", nn.initializers.normal(1.0 / d), (d,))
        self.mean_bias = self.param("mean_bias", nn.initializers.zeros, ())

    def _factor(self, x: jnp.ndarray):
        """x: (b, s, d) -> (K, L) with A = K + noise I = L L^T."""
        # 1e-3 floor: softplus alone can underflow to 0 under joint
        # training, and xs = x/ls then overflows (d2 = inf-inf = NaN).
        ls = softplus(self.raw_lengthscale) + 1e-3
        os_ = softplus(self.raw_outputscale)
        noise = softplus(self.raw_noise) + _NOISE_FLOOR
        xs = x / ls
        x2 = jnp.sum(xs * xs, axis=-1)
        # precision=HIGHEST is load-bearing: TPU DEFAULT precision runs
        # this Gram GEMM on single-pass bf16 inputs while x2 stays exact
        # fp32, an inconsistent decomposition whose ~2^-8|xs|^2 error is
        # exp-amplified into an INDEFINITE K once lengthscales shrink in
        # joint training — the (formerly mysterious) field-run forward
        # NaN: a well-conditioned A whose factorization still failed
        # (min eig -0.085 vs noise 0.38 on the captured batch;
        # scripts/exact_blur_repro.py).
        d2 = x2[..., :, None] + x2[..., None, :] - 2.0 * jnp.einsum(
            "bnd,bmd->bnm", xs, xs, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        k = os_ * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
        a = k + noise * jnp.eye(x.shape[1], dtype=k.dtype)
        fact = batched_cholesky if self.use_pallas else jnp.linalg.cholesky
        # psd-safe escalation (gpytorch psd_safe_cholesky semantics, see
        # gp/exact.py): probe on a stop-gradient copy for the smallest
        # 10^i * 1e-4 * mean-diag jitter (shared across the batch) that
        # factorizes finite, then ONE differentiable factorization.
        # fp32 at s=384 NaNs under a trained outputscale of O(100) on
        # non-stationary data (results_r3/abl_field_exact: 2/3 seeds).
        eye = jnp.eye(x.shape[1], dtype=k.dtype)
        a0 = jax.lax.stop_gradient(a)
        s0 = jnp.mean(jnp.diagonal(a0, axis1=-2, axis2=-1))

        def probe(i):
            return fact(a0 + (1e-4 * s0 * 10.0**i) * eye)

        def cond(state):
            i, c = state
            return jnp.logical_and(i < 3.0, ~jnp.all(jnp.isfinite(c)))

        def body(state):
            i, _ = state
            return i + 1.0, probe(i + 1.0)

        i_sel, _ = jax.lax.while_loop(cond, body, (0.0, probe(0.0)))
        chol = fact(a + (1e-4 * s0 * 10.0**i_sel) * eye)
        return k, chol

    def smooth(self, x: jnp.ndarray) -> jnp.ndarray:
        """Posterior-mean smoothing of the hidden projection: (b, s)."""
        k, chol = self._factor(x)
        z = jnp.einsum("bsd,d->bs", x, self.mean_weight) + self.mean_bias
        alpha = jax.scipy.linalg.cho_solve((chol, True), z[..., None])[..., 0]
        return jnp.einsum("bst,bt->bs", k, alpha,
                          preferred_element_type=jnp.float32)

    def mll(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Per-point exact marginal log likelihood, averaged over batch.

        x: (b, s, d); y: (b, s).
        """
        _, chol = self._factor(x)
        resid = (y - (jnp.einsum("bsd,d->bs", x, self.mean_weight)
                      + self.mean_bias))[..., None]
        alpha = jax.scipy.linalg.cho_solve((chol, True), resid)
        n = y.shape[-1]
        quad = jnp.sum(resid * alpha, axis=(-1, -2))
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
        mll = -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))
        return jnp.mean(mll / n)

    def __call__(self, x: jnp.ndarray,
                 y: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        mean = self.smooth(x)
        mll = self.mll(x, y) if y is not None else None
        return mean, mll

"""CMGP baseline: convolved-process Gaussian-process forecaster.

The reference's published baseline grid (``Additional-baselines.pdf``
Table 1; BASELINE.md) compares AutoDG against a ``CMGP`` column, but ships
no CMGP code — this module supplies the missing baseline so the harness
covers every name in the grid.  CMGP (convolved multi-output GP, Alvarez &
Lawrence) builds each output by convolving Q shared white-noise latent
processes with Gaussian smoothing kernels; on the harness's univariate
windows that construction reduces to a single-output GP whose covariance is
a Q-component mixture of RBFs over time,

    k(t, t') = sum_q  s_q * exp(-(t - t')^2 / (4 * l_q^2)) ,

with s_q > 0 linear mixture weights (softplus) and 4 l_q^2 the
l_q^2 + l_q'^2 variance of two convolved width-l_q kernels, plus a
constant mean and Gaussian observation noise.  Hyperparameters are
trained by exact marginal likelihood over the training windows; the
forecast is the exact GP posterior mean at the horizon time points given
the window's history.

TPU notes: the time grid is static, so the (T, T) Gram matrix is shared by
every window in a batch — one Cholesky per step, solved against a (T, b)
right-hand side (a triangular solve that batches over windows, not over
matrices).  Distances are exact broadcast subtractions of a scalar grid
(no GEMM => no TPU default-precision Gram hazard; see gp/kernels.sq_dist).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from fine_grained_gaussian_process_forcasting_tpu.gp.exact import (
    psd_safe_cholesky,
)
from fine_grained_gaussian_process_forcasting_tpu.gp.kernels import softplus


def _inv_softplus(y: np.ndarray) -> np.ndarray:
    # stable inverse of softplus for init constants
    return y + np.log(-np.expm1(-y))


class CMGP(nn.Module):
    """Convolved-process GP regression over a fixed hourly time grid.

    ``__call__(x)``: x (b, L, 1) history -> (b, pred_len, 1) posterior mean.
    ``nll(x, y)``:   mean per-point negative log marginal likelihood of the
                     joint [history ++ target] window (the training loss).
    """

    pred_len: int
    n_latent: int = 2
    jitter: float = 1e-4

    def setup(self):
        q = self.n_latent
        # smoothing-kernel widths staggered across octaves so the mixture
        # spans short- and long-range structure at init (time unit: 1 day)
        width0 = 0.125 * (4.0 ** np.arange(q, dtype=np.float64))
        self.raw_width = self.param(
            "raw_width",
            lambda _: jnp.asarray(_inv_softplus(width0), jnp.float32))
        self.raw_scale = self.param(
            "raw_scale",
            lambda _: jnp.full((q,), float(_inv_softplus(1.0 / q)),
                               jnp.float32))
        self.raw_noise = self.param(
            "raw_noise",
            lambda _: jnp.asarray(float(_inv_softplus(0.1)), jnp.float32))
        self.mean_const = self.param(
            "mean_const", lambda _: jnp.zeros((), jnp.float32))

    def _hyper(self):
        return (softplus(self.raw_width), softplus(self.raw_scale),
                softplus(self.raw_noise), self.mean_const)

    def _gram(self, t_row, t_col, widths, scales):
        """Mixture-of-RBF covariance on scalar time grids (exact, no GEMM)."""
        d2 = (t_row[:, None] - t_col[None, :]) ** 2  # (R, C)
        var = 4.0 * widths**2  # convolution of two width-l kernels
        return jnp.sum(
            scales[:, None, None]
            * jnp.exp(-d2[None] / var[:, None, None]), axis=0)

    @staticmethod
    def _grid(n: int) -> jnp.ndarray:
        # hourly data; unit = 1 day so daily structure sits at width ~ 1
        return jnp.arange(n, dtype=jnp.float32) / 24.0

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        widths, scales, noise, mean = self._hyper()
        L = x.shape[1]
        t = self._grid(L + self.pred_len)
        t_h, t_f = t[:L], t[L:]
        k_hh = self._gram(t_h, t_h, widths, scales)
        k_hh += (noise + self.jitter) * jnp.eye(L, dtype=k_hh.dtype)
        k_fh = self._gram(t_f, t_h, widths, scales)  # (H, L)
        chol = psd_safe_cholesky(k_hh)
        resid = (x[..., 0] - mean).T  # (L, b)
        alpha = solve_triangular(
            chol.T, solve_triangular(chol, resid, lower=True),
            lower=False)  # K^-1 (y - m), (L, b)
        return (mean + (k_fh @ alpha).T)[..., None]  # (b, H, 1)

    def nll(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Mean per-point negative log marginal likelihood, joint window."""
        widths, scales, noise, mean = self._hyper()
        z = jnp.concatenate([x, y], axis=1)[..., 0]  # (b, T)
        T = z.shape[1]
        t = self._grid(T)
        k = self._gram(t, t, widths, scales)
        k += (noise + self.jitter) * jnp.eye(T, dtype=k.dtype)
        chol = psd_safe_cholesky(k)
        resid = (z - mean).T  # (T, b)
        w = solve_triangular(chol, resid, lower=True)  # L^-1 (y - m)
        quad = jnp.mean(jnp.sum(w * w, axis=0))
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return 0.5 * (quad + logdet + T * jnp.log(2.0 * jnp.pi)) / T

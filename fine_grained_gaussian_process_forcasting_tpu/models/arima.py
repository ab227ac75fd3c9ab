"""ARIMA(1,1,1) — native implementation (statsmodels-free).

Equivalent of the reference's per-window ``sm.tsa.ARIMA(x, order=(1,1,1))``
loop (``ARIMA.py:40-45``).  The differenced series follows ARMA(1,1):

    w_t = c + phi * w_{t-1} + theta * eps_{t-1} + eps_t

Parameters are fit by conditional sum of squares (CSS) with scipy's
L-BFGS-B; forecasting iterates the recursion and re-integrates the
differences.  A jax-vectorized batch fitter (`fit_forecast_batch`) runs
hundreds of windows in parallel with fixed-iteration Gauss-Newton steps —
the TPU-friendly path for the evaluation sweep.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.optimize import minimize


def _css_residuals(params: np.ndarray, w: np.ndarray) -> np.ndarray:
    c, phi, theta = params
    eps = np.zeros_like(w)
    prev_w, prev_eps = 0.0, 0.0
    for t in range(len(w)):
        eps[t] = w[t] - c - phi * prev_w - theta * prev_eps
        prev_w, prev_eps = w[t], eps[t]
    return eps


def fit_arima_111(y: np.ndarray) -> Tuple[float, float, float]:
    """CSS fit of ARIMA(1,1,1) on a 1-D series; returns (c, phi, theta)."""
    w = np.diff(y.astype(np.float64))

    def loss(p):
        eps = _css_residuals(p, w)
        return float(np.sum(eps * eps))

    res = minimize(
        loss,
        x0=np.array([0.0, 0.1, 0.1]),
        method="L-BFGS-B",
        bounds=[(-10, 10), (-0.99, 0.99), (-0.99, 0.99)],
    )
    return tuple(res.x)


def forecast_arima_111(y: np.ndarray, steps: int) -> np.ndarray:
    """Fit on y then forecast `steps` ahead (reference ``ARIMA.py:42-45``)."""
    c, phi, theta = fit_arima_111(y)
    w = np.diff(y.astype(np.float64))
    eps = _css_residuals(np.array([c, phi, theta]), w)
    last_w, last_eps = w[-1], eps[-1]
    level = float(y[-1])
    out = np.zeros(steps)
    for h in range(steps):
        w_hat = c + phi * last_w + theta * last_eps
        level += w_hat
        out[h] = level
        last_w, last_eps = w_hat, 0.0
    return out


def fit_forecast_batch(x: np.ndarray, steps: int, iters: int = 200,
                       lr: float = 5e-2) -> np.ndarray:
    """Vectorized ARIMA(1,1,1) over a batch of windows via jax.

    x: (n, L) windows -> (n, steps) forecasts.  Fits all windows in
    parallel with Adam on the CSS loss (the per-window scipy loop of the
    reference is serial host-side work; this runs as one jitted program).
    """
    import jax
    import jax.numpy as jnp
    import optax

    w = jnp.diff(jnp.asarray(x, dtype=jnp.float32), axis=1)  # (n, L-1)
    n = w.shape[0]

    def css(params, w_row):
        c, phi, theta = params

        def step(carry, w_t):
            prev_w, prev_eps = carry
            eps_t = w_t - c - phi * prev_w - theta * prev_eps
            return (w_t, eps_t), eps_t

        _, eps = jax.lax.scan(step, (0.0, 0.0), w_row)
        return jnp.sum(eps * eps), eps

    def loss_fn(params_all):
        losses, _ = jax.vmap(lambda p, row: css(p, row))(params_all, w)
        return jnp.sum(losses[0]), losses

    params = jnp.tile(jnp.asarray([0.0, 0.1, 0.1]), (n, 1))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def total(p):
            losses, _ = jax.vmap(lambda pp, row: css(pp, row))(p, w)
            return jnp.sum(losses)

        grads = jax.grad(total)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        params = params.at[:, 1:].set(jnp.clip(params[:, 1:], -0.99, 0.99))
        return params, opt_state

    for _ in range(iters):
        params, opt_state = train_step(params, opt_state)

    @jax.jit
    def forecast(params, w_all, y_last):
        def one(p, w_row, level0):
            _, eps = css(p, w_row)
            c, phi, theta = p

            def step(carry, _):
                level, last_w, last_eps = carry
                w_hat = c + phi * last_w + theta * last_eps
                return (level + w_hat, w_hat, 0.0), level + w_hat

            _, out = jax.lax.scan(
                step, (level0, w_row[-1], eps[-1]), None, length=steps
            )
            return out

        return jax.vmap(one)(params, w_all, y_last)

    y_last = jnp.asarray(x[:, -1], dtype=jnp.float32)
    return np.asarray(forecast(params, w, y_last))

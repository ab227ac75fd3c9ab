"""Baseline model tests: DLinear, DeepAR, N-BEATS, ARIMA, univariate loader."""

import jax
import jax.numpy as jnp
import numpy as np

from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)
from fine_grained_gaussian_process_forcasting_tpu.data.univariate import (
    UnivariateLoader,
)
from fine_grained_gaussian_process_forcasting_tpu.models.arima import (
    fit_forecast_batch,
    forecast_arima_111,
)
from fine_grained_gaussian_process_forcasting_tpu.models.deepar import (
    DeepAR,
    deepar_nll,
)
from fine_grained_gaussian_process_forcasting_tpu.models.dlinear import (
    DLinear,
    moving_avg,
    series_decomp,
)
from fine_grained_gaussian_process_forcasting_tpu.models.nbeats import NBeats


def test_moving_avg_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 40, 3)).astype(np.float32)
    k = 25
    got = np.asarray(moving_avg(jnp.asarray(x), k))
    pad = (k - 1) // 2
    xp = np.concatenate(
        [np.repeat(x[:, :1], pad, 1), x, np.repeat(x[:, -1:], pad, 1)], axis=1
    )
    ref = np.stack(
        [xp[:, i : i + k].mean(1) for i in range(40)], axis=1
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_series_decomp_sums():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 50, 1)),
                    dtype=jnp.float32)
    res, mean = series_decomp(x)
    np.testing.assert_allclose(np.asarray(res + mean), np.asarray(x),
                               rtol=1e-4, atol=1e-5)


def test_dlinear_learns_linear_trend():
    """DLinear must extrapolate a clean linear trend almost exactly."""
    t = np.arange(60, dtype=np.float32)
    x = np.stack([t[:48] * s for s in (0.5, 1.0, 2.0)])[..., None]
    y = np.stack([t[48:] * s for s in (0.5, 1.0, 2.0)])[..., None]
    model = DLinear(seq_len=48, pred_len=12)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    import optax

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss(p):
            return jnp.mean((model.apply({"params": p}, jnp.asarray(x))
                             - jnp.asarray(y)) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    for _ in range(300):
        params, state, l = step(params, state)
    assert float(l) < 1.0


def test_deepar_forward_and_nll():
    model = DeepAR(embedding_dim=8, hidden_dim=8, n_layers=2)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 20, 1)),
                    dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mu, sigma = model.apply({"params": params}, x)
    assert mu.shape == (4, 20)
    assert np.all(np.asarray(sigma) > 0)
    nll = deepar_nll(mu, sigma, x[..., 0])
    assert np.isfinite(float(nll))


def test_deepar_ancestral_sampling():
    model = DeepAR(embedding_dim=8, hidden_dim=8, n_layers=1)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 20, 1)),
                    dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    samples = model.apply({"params": params}, x, 6, jax.random.PRNGKey(1),
                          3, method="sample")
    assert samples.shape == (3, 4, 6)
    assert np.all(np.isfinite(np.asarray(samples)))


def test_nbeats_backcast_forecast():
    model = NBeats(backcast_length=48, forecast_length=12)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(4, 48, 1)),
                    dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    backcast, forecast = model.apply({"params": params}, x)
    assert backcast.shape == (4, 48)
    assert forecast.shape == (4, 12)
    assert np.all(np.isfinite(np.asarray(forecast)))


def test_arima_recovers_ar_process():
    rng = np.random.default_rng(5)
    n = 300
    # integrated AR(1): diff follows w_t = 0.7 w_{t-1} + eps
    w = np.zeros(n)
    for t in range(1, n):
        w[t] = 0.7 * w[t - 1] + rng.normal(0, 0.1)
    y = np.cumsum(w) + 10
    fc = forecast_arima_111(y, steps=5)
    assert fc.shape == (5,)
    # forecast must continue smoothly from the last level
    assert abs(fc[0] - y[-1]) < 1.0


def test_arima_batch_matches_scalar():
    rng = np.random.default_rng(6)
    xs = np.cumsum(rng.normal(size=(4, 120)), axis=1).astype(np.float32)
    batch_fc = fit_forecast_batch(xs, steps=4, iters=300)
    assert batch_fc.shape == (4, 4)
    for i in range(4):
        ref = forecast_arima_111(xs[i], 4)
        # both should continue from the last level in the same direction
        assert abs(batch_fc[i, 0] - xs[i, -1]) < 2.0
        assert abs(ref[0] - xs[i, -1]) < 2.0


def test_univariate_loader_shapes():
    df = make_synthetic_frame("electricity", num_entities=3,
                              steps_per_entity=800, seed=7)
    loader = UnivariateLoader(df, target_col="power_usage", pred_len=24,
                              max_encoder_length=96, max_train_sample=512,
                              max_test_sample=128, batch_size=64)
    assert loader.train_loader.x_enc.shape[1:] == (64, 72, 1)
    assert loader.train_loader.x_dec.shape[1:] == (64, 24, 1)
    assert loader.train_loader.y.shape[1:] == (64, 24, 1)
    # history and target must be contiguous: last x_dec step precedes y
    xe, xd, y = next(iter(loader.train_loader))
    assert np.isfinite(xe).all() and np.isfinite(y).all()


# --------------------------------------------------------------------- #
# CMGP (convolved-process GP baseline; fills the reference grid's CMGP
# column, Additional-baselines.pdf Table 1 — no code ships with the ref)

def _cmgp_setup(L=48, H=12, b=6, seed=9):
    from fine_grained_gaussian_process_forcasting_tpu.models.cmgp import CMGP

    rng = np.random.default_rng(seed)
    t = np.arange(L + H) / 24.0
    y = (np.sin(2 * np.pi * t / 2.5)[None]
         + 0.3 * rng.normal(size=(b, 1))) + 0.02 * rng.normal(size=(b, L + H))
    y = y.astype(np.float32)
    model = CMGP(pred_len=H, n_latent=2)
    x_hist = jnp.asarray(y[:, :L, None])
    y_fut = jnp.asarray(y[:, L:, None])
    params = model.init(jax.random.PRNGKey(0), x_hist)["params"]
    return model, params, x_hist, y_fut


def test_cmgp_nll_matches_naive_mvn():
    """Module NLL == dense multivariate-normal logpdf computed in numpy."""
    from fine_grained_gaussian_process_forcasting_tpu.gp.kernels import (
        softplus,
    )

    model, params, x, y = _cmgp_setup()
    got = float(model.apply({"params": params}, x, y, method="nll"))

    w = np.asarray(softplus(jnp.asarray(params["raw_width"])), np.float64)
    s = np.asarray(softplus(jnp.asarray(params["raw_scale"])), np.float64)
    noise = float(softplus(jnp.asarray(params["raw_noise"])))
    mean = float(params["mean_const"])
    z = np.concatenate([np.asarray(x), np.asarray(y)], axis=1)[..., 0]
    T = z.shape[1]
    tg = np.arange(T) / 24.0
    d2 = (tg[:, None] - tg[None, :]) ** 2
    K = sum(s[q] * np.exp(-d2 / (4.0 * w[q] ** 2)) for q in range(len(w)))
    K += (noise + model.jitter) * np.eye(T)
    Ki = np.linalg.inv(K)
    _, logdet = np.linalg.slogdet(K)
    quad = np.mean(np.einsum("bi,ij,bj->b", z - mean, Ki, z - mean))
    ref = 0.5 * (quad + logdet + T * np.log(2 * np.pi)) / T
    # fp32 Cholesky vs fp64 dense inverse on a smooth (ill-conditioned)
    # kernel: agreement to ~0.3% is the fp32 limit here
    np.testing.assert_allclose(got, ref, rtol=1e-2)


def test_cmgp_posterior_interpolates_smooth_series():
    """Near-noiseless smooth series: the first forecast steps continue it."""
    model, params, x, y = _cmgp_setup(seed=3)
    pred = np.asarray(model.apply({"params": params}, x))
    assert pred.shape == np.asarray(y).shape
    # short-range extrapolation of a smooth sine beats mean prediction
    err_gp = np.mean((pred[:, :4, 0] - np.asarray(y)[:, :4, 0]) ** 2)
    err_mean = np.mean(
        (np.asarray(x).mean(axis=1, keepdims=True)[..., 0]
         - np.asarray(y)[:, :4, 0]) ** 2)
    assert np.isfinite(pred).all()
    assert err_gp < 0.5 * err_mean


def test_cmgp_nll_training_step_reduces_loss():
    import optax

    model, params, x, y = _cmgp_setup()
    loss = lambda p: model.apply({"params": p}, x, y, method="nll")
    opt = optax.adam(1e-2)
    state = opt.init(params)
    l0 = float(loss(params))

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(30):
        params, state, l = step(params, state)
    assert float(l) < l0
    assert np.isfinite(float(l))

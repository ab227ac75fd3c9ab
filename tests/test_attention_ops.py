"""Numerical tests for the attention/correlation op zoo (SURVEY.md s4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fine_grained_gaussian_process_forcasting_tpu.ops.attention import (
    scaled_dot_attention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.autocorrelation import (
    auto_correlation,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.conv_attention import (
    ACATAttention,
    ATAAttention,
    ConvAttnAttention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.fourier import (
    FourierBlock,
    FourierCrossAttention,
    get_frequency_modes,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.probsparse import (
    prob_sparse_attention,
)

B, H, L, D = 2, 4, 32, 8


def _qkv(seed=0, l_k=None):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (B, H, L, D))
    k = jax.random.normal(k2, (B, H, l_k or L, D))
    v = jax.random.normal(k3, (B, H, l_k or L, D))
    return q, k, v


def test_basic_attention_matches_naive():
    q, k, v = _qkv()
    ctx, attn = scaled_dot_attention(q, k, v)
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(D)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    a = e / e.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", a, v)
    np.testing.assert_allclose(np.asarray(ctx), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, rtol=1e-5)


def test_autocorrelation_identity_series():
    """A pure periodic signal should aggregate along its own period."""
    t = jnp.arange(L)
    sig = jnp.sin(2 * jnp.pi * t / 8)
    q = jnp.broadcast_to(sig, (B, H, D, L)).transpose(0, 1, 3, 2)
    ctx, mean_corr = auto_correlation(q, q, q, training=True)
    assert ctx.shape == (B, H, L, D)
    assert np.all(np.isfinite(np.asarray(ctx)))
    # the autocorrelation of the periodic series must peak at delay 0 / 8 / 16
    mean_corr = np.asarray(mean_corr).mean(axis=0)
    top = set(np.argsort(mean_corr)[-3:].tolist())
    assert top & {0, 8, 16, 24}


def test_autocorrelation_inference_mode():
    q, k, v = _qkv(1)
    ctx, _ = auto_correlation(q, k, v, training=False)
    assert ctx.shape == (B, H, L, D)
    assert np.all(np.isfinite(np.asarray(ctx)))


def test_autocorrelation_cross_lengths():
    """L_q < L_k truncates keys/values (reference Autoformer.py:107-113)."""
    q, k, v = _qkv(2, l_k=L * 2)
    ctx, _ = auto_correlation(q, k, v, training=True)
    assert ctx.shape == (B, H, L, D)


def test_probsparse_shapes_and_mean_fallback():
    q, k, v = _qkv(3)
    ctx, _ = prob_sparse_attention(q, k, v, jax.random.PRNGKey(0))
    assert ctx.shape == (B, H, L, D)
    # u = ceil(ln(32)) = 4 queries updated; the rest = mean of V
    v_mean = np.asarray(v.mean(axis=-2))
    ctx_np = np.asarray(ctx)
    matches_mean = np.isclose(
        ctx_np, v_mean[:, :, None, :], atol=1e-5
    ).all(-1).sum(-1)
    assert np.all(matches_mean >= L - 4)


@pytest.mark.parametrize("cls", [ATAAttention, ACATAttention, ConvAttnAttention])
def test_conv_attention_ops(cls):
    q, k, v = _qkv(4)
    mod = cls(d_k=D, n_heads=H)
    variables = mod.init(jax.random.PRNGKey(0), q, k, v)
    ctx, attn = mod.apply(variables, q, k, v)
    assert ctx.shape == (B, H, L, D)
    assert np.all(np.isfinite(np.asarray(ctx)))
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, rtol=1e-4)


def test_fourier_block_roundtrip_energy():
    mod = FourierBlock(
        in_channels=H * D, out_channels=H * D, seq_len=L, modes=8, n_heads=H
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (B, L, H, D))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out, _ = mod.apply(variables, x)
    assert out.shape == (B, L, H, D)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fourier_cross_attention():
    mod = FourierCrossAttention(
        in_channels=H * D, out_channels=H * D, seq_len_q=L, seq_len_kv=L,
        modes=8, n_heads=H,
    )
    q = jax.random.normal(jax.random.PRNGKey(6), (B, L, H, D))
    k = jax.random.normal(jax.random.PRNGKey(7), (B, L, H, D))
    variables = mod.init(jax.random.PRNGKey(0), q, k)
    out, _ = mod.apply(variables, q, k)
    assert out.shape == (B, L, H, D)
    assert np.all(np.isfinite(np.asarray(out)))


def test_frequency_mode_selection():
    idx = get_frequency_modes(96, modes=8, mode_select_method="random", seed=0)
    assert len(idx) == 8
    assert idx == sorted(idx)
    assert all(0 <= i < 48 for i in idx)
    low = get_frequency_modes(96, modes=8, mode_select_method="lowest")
    assert low == list(range(8))


def test_autocorrelation_pow2_fold_exact():
    """The padded-FFT wrap-fold must equal the direct circular-L correlation."""
    rng = np.random.default_rng(9)
    L = 24  # non-power-of-two
    q = rng.normal(size=(1, 1, L, 3)).astype(np.float32)
    k = rng.normal(size=(1, 1, L, 3)).astype(np.float32)
    _, mean_corr = auto_correlation(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(k), training=True)
    qt = q.transpose(0, 1, 3, 2)
    kt = k.transpose(0, 1, 3, 2)
    ref = np.fft.irfft(np.fft.rfft(qt, axis=-1) *
                       np.conj(np.fft.rfft(kt, axis=-1)), n=L, axis=-1)
    np.testing.assert_allclose(np.asarray(mean_corr), ref.mean(axis=(1, 2)),
                               rtol=1e-4, atol=1e-4)


def test_dft_gemm_matches_fft_reference():
    """The DFT-as-GEMM transforms inside auto_correlation/_delay_aggregate
    are numerically the exact circular-L FFT pipeline (tight tolerance,
    independent jnp.fft reference)."""
    from fine_grained_gaussian_process_forcasting_tpu.ops.autocorrelation import (
        _delay_aggregate,
        auto_correlation,
    )

    rng = np.random.default_rng(7)
    b, h, L, d = 3, 2, 192, 4
    q = jnp.asarray(rng.normal(size=(b, h, L, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, L, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, L, d)).astype(np.float32))

    # corr path: mean over (h, d) of circular cross-correlation via FFT
    qt = np.asarray(q).transpose(0, 1, 3, 2)
    kt = np.asarray(k).transpose(0, 1, 3, 2)
    spec = np.fft.rfft(qt, axis=-1) * np.conj(np.fft.rfft(kt, axis=-1))
    want_corr = np.fft.irfft(spec.mean(axis=(1, 2)), n=L, axis=-1)
    _, got_corr = auto_correlation(q, k, v, training=True)
    np.testing.assert_allclose(np.asarray(got_corr), want_corr,
                               rtol=1e-4, atol=1e-4)

    # aggregation path: weighted circular left-rolls
    delays = jnp.asarray([3, 17, 100])
    weights = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32))
    vt = jnp.asarray(np.asarray(v).transpose(0, 1, 3, 2))
    got = np.asarray(_delay_aggregate(vt, delays, weights))
    want = np.zeros_like(got)
    for i, dl in enumerate([3, 17, 100]):
        want += np.asarray(weights)[:, i][:, None, None, None] * np.roll(
            np.asarray(vt), -dl, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

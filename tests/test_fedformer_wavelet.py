"""FEDformer + multiwavelet stack tests (SURVEY.md s2.2/2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fine_grained_gaussian_process_forcasting_tpu.models.fedformer import (
    FEDformer,
    FEDformerConfig,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.decomposition import (
    MyLayerNorm,
    SeriesDecompMulti,
    moving_avg,
    series_decomp,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.full_attention import (
    full_attention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.wavelet import (
    MWTCZ,
    MultiWaveletCross,
    MultiWaveletTransform,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.wavelet_filters import (
    filter_bank,
)


def _pr_error(H0, H1, G0, G1, PHI0, PHI1):
    H0r, G0r = H0 @ PHI0, G0 @ PHI0
    H1r, G1r = H1 @ PHI1, G1 @ PHI1
    ec_s = np.concatenate([H0.T, H1.T], 0)
    ec_d = np.concatenate([G0.T, G1.T], 0)
    rc_e = np.concatenate([H0r, G0r], 0)
    rc_o = np.concatenate([H1r, G1r], 0)
    k = H0.shape[0]
    rng = np.random.default_rng(0)
    xe = rng.normal(size=(64, k))
    xo = rng.normal(size=(64, k))
    xa = np.concatenate([xe, xo], -1)
    sd = np.concatenate([xa @ ec_s, xa @ ec_d], -1)
    return max(np.abs(sd @ rc_e - xe).max(), np.abs(sd @ rc_o - xo).max())


@pytest.mark.parametrize("k", [2, 4, 8])
def test_legendre_filter_bank_perfect_reconstruction(k):
    err = _pr_error(*filter_bank("legendre", k))
    assert err < 1e-5, err


def test_chebyshev_filter_bank_small_k():
    # the Chebyshev construction is inherently approximate (reference's own
    # quadrature scheme); k=4 reconstructs well
    err = _pr_error(*filter_bank("chebyshev", 4))
    assert err < 1e-6, err


def test_filter_bank_orthogonality_legendre():
    H0, H1, G0, G1, _, _ = filter_bank("legendre", 8)
    # rows of [H0 H1; G0 G1] are orthonormal for an orthonormal MRA
    W = np.block([[H0, H1], [G0, G1]])
    np.testing.assert_allclose(W @ W.T, np.eye(16), atol=1e-6)


def test_mwtcz_roundtrip_shape():
    mod = MWTCZ(k=4, alpha=8, c=4, base="legendre")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 4, 4))
    variables = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(variables, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_multiwavelet_transform_self_attention_iface():
    mod = MultiWaveletTransform(ich=32, k=4, c=8)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 4, 8))
    variables = mod.init(jax.random.PRNGKey(1), q, q, q)
    out, attn = mod.apply(variables, q, q, q)
    assert out.shape == (2, 16, 4, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_multiwavelet_cross_attention():
    mod = MultiWaveletCross(in_channels=32, out_channels=32, modes=8,
                            ich=32, k=4, c=8)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 4, 8))
    kv = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4, 8))
    variables = mod.init(jax.random.PRNGKey(2), q, kv, kv)
    out, _ = mod.apply(variables, q, kv, kv)
    assert out.shape == (2, 24, 4, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_decomposition_ops():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 48, 4))
    res, trend = series_decomp(x, 25)
    np.testing.assert_allclose(np.asarray(res + trend), np.asarray(x),
                               rtol=1e-4, atol=1e-5)
    # even kernel: asymmetric padding must still preserve length
    assert moving_avg(x, 24).shape == x.shape

    mod = SeriesDecompMulti((13, 17))
    variables = mod.init(jax.random.PRNGKey(1), x)
    res_m, trend_m = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(res_m + trend_m), np.asarray(x),
                               rtol=1e-4, atol=1e-5)

    ln = MyLayerNorm(4)
    variables = ln.init(jax.random.PRNGKey(2), x)
    y = ln.apply(variables, x)
    # temporal mean removed
    np.testing.assert_allclose(np.asarray(y.mean(axis=1)), 0.0, atol=1e-5)


def test_full_attention_causal_mask():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 2, 4))
    out, attn = full_attention(q, q, q, mask_flag=True)
    a = np.asarray(attn)[0, 0]
    assert np.allclose(a[np.triu_indices(6, 1)], 0.0)


@pytest.mark.parametrize("version", ["Fourier", "Wavelets", "Autoformer"])
def test_fedformer_versions(version):
    cfg = FEDformerConfig(
        enc_in=3, dec_in=3, c_out=3, seq_len=32, label_len=16, pred_len=8,
        d_model=16, n_heads=4, d_ff=16, e_layers=1, d_layers=1,
        moving_avg=(9,), version=version, modes=4, wavelet_k=4, L=0,
    )
    model = FEDformer(cfg)
    b = 2
    x_enc = jax.random.normal(jax.random.PRNGKey(0), (b, 32, 3))
    x_mark_enc = jax.random.normal(jax.random.PRNGKey(1), (b, 32, 4))
    x_dec = jax.random.normal(jax.random.PRNGKey(2), (b, 24, 3))
    x_mark_dec = jax.random.normal(jax.random.PRNGKey(3), (b, 24, 4))
    variables = model.init(jax.random.PRNGKey(4), x_enc, x_mark_enc,
                           x_dec, x_mark_dec)
    out = model.apply(variables, x_enc, x_mark_enc, x_dec, x_mark_dec)
    assert out.shape == (b, 8, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_informer_stack():
    from fine_grained_gaussian_process_forcasting_tpu.models.informer_stack import (
        ConvLayer,
        InformerDecoderLayer,
        InformerEncoder,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 16))
    enc = InformerEncoder(d_model=16, n_layers=2, n_heads=4, distil=True)
    variables = enc.init(jax.random.PRNGKey(1), x)
    out = enc.apply(variables, x)
    # distilled once: conv pad-2 gives 26, stride-2 pool -> 13 (matches the
    # reference's Conv1d(padding=2) + MaxPool1d(3,2,1) arithmetic)
    assert out.shape == (2, 13, 16)
    assert np.all(np.isfinite(np.asarray(out)))

    dec_in = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16))
    dec = InformerDecoderLayer(d_model=16, n_heads=4)
    dv = dec.init(jax.random.PRNGKey(3), dec_in, out)
    y = dec.apply(dv, dec_in, out)
    assert y.shape == (2, 8, 16)

    # ConvLayer ~halves the length (stride-2 pool over the pad-2 conv)
    cl = ConvLayer(16)
    cv = cl.init(jax.random.PRNGKey(4), x)
    assert cl.apply(cv, x).shape == (2, 13, 16)

"""int8 post-training quantization for serving (train/quantize.py).

The reference has no quantized inference; this is the TPU-native serving
addition (int8 MXU GEMMs at ~2x bf16 rate on v5e).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fine_grained_gaussian_process_forcasting_tpu.models import (
    ForecastDenoising,
)
from fine_grained_gaussian_process_forcasting_tpu.train.predict import (
    InferenceSession,
)
from fine_grained_gaussian_process_forcasting_tpu.train.quantize import (
    int8_dense,
    int8_dense_interceptor,
)


def test_int8_dense_matches_fp32_within_quant_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 7, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))
    ref = x @ w + b
    got = int8_dense(x, w, b)
    # int8 rounding: relative error ~ 1/127 per factor; allow a small
    # multiple for accumulation
    err = np.abs(np.asarray(got - ref))
    scale = np.abs(np.asarray(ref)) + 1.0
    assert np.max(err / scale) < 0.1, np.max(err / scale)
    # the GEMM must actually be int8 x int8 -> int32 (not a float fake):
    jaxpr = jax.make_jaxpr(int8_dense)(x, w, b)
    dots = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert dots and all(
        e.invars[0].aval.dtype == jnp.int8
        and e.invars[1].aval.dtype == jnp.int8
        and e.params["preferred_element_type"] == jnp.int32
        for e in dots), dots


def test_interceptor_replaces_dense_only():
    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(8)(x)
            x = nn.LayerNorm()(x)
            return nn.Dense(2)(x)

    net = Net()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 6)),
                    dtype=jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x)
    ref = net.apply(v, x)
    with nn.intercept_methods(int8_dense_interceptor):
        got = net.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.1, atol=0.05)
    assert not np.allclose(np.asarray(got), np.asarray(ref))  # really int8


def _flagship(attn="autoformer"):
    return ForecastDenoising(
        src_input_size=4, tgt_input_size=4, d_model=16, n_heads=4, d_k=4,
        stack_size=1, pred_len=8, attn_type=attn, gp=True, denoise=True,
        num_inducing=16)


def test_int8_session_close_to_fp32_session():
    # continuous path (basic attention): the autoformer's discrete topk
    # delay selection can flip under quant noise on a RANDOM-INIT model
    # (near-tie correlations), which is a property of the op, not of the
    # quantization — the autoformer variant is covered below for
    # shape/finiteness
    model = _flagship("basic")
    rng = np.random.default_rng(2)
    enc = rng.normal(size=(6, 24, 4)).astype(np.float32)
    dec = rng.normal(size=(6, 8, 4)).astype(np.float32)
    y = rng.normal(size=(6, 8, 1)).astype(np.float32)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "noise": jax.random.PRNGKey(1),
                    "sampling": jax.random.PRNGKey(2)},
                   jnp.asarray(enc), jnp.asarray(dec), jnp.asarray(y),
                   training=True)

    fp32 = InferenceSession(model, v["params"], batch_size=4)
    int8 = InferenceSession(model, v["params"], batch_size=4,
                            quantize="int8")
    p32 = fp32.predict(enc, dec)
    p8 = int8.predict(enc, dec)
    assert p8.shape == p32.shape == (6, 8, 1)
    assert np.all(np.isfinite(p8))
    # quantization noise stays small relative to the prediction range
    denom = np.abs(p32).max() + 1e-3
    assert np.max(np.abs(p8 - p32)) / denom < 0.15, (
        np.max(np.abs(p8 - p32)) / denom)

    auto = _flagship("autoformer")
    va = auto.init({"params": jax.random.PRNGKey(0),
                    "noise": jax.random.PRNGKey(1),
                    "sampling": jax.random.PRNGKey(2)},
                   jnp.asarray(enc), jnp.asarray(dec), jnp.asarray(y),
                   training=True)
    s8 = InferenceSession(auto, va["params"], batch_size=4,
                          quantize="int8")
    pa = s8.predict(enc, dec)
    assert pa.shape == (6, 8, 1) and np.all(np.isfinite(pa))


def test_int8_session_rejects_unknown_mode():
    model = _flagship()
    try:
        InferenceSession(model, {}, quantize="fp4")
    except ValueError as e:
        assert "fp4" in str(e)
    else:
        raise AssertionError("expected ValueError")

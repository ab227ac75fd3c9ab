"""Encoder-decoder transformer assembly (Flax).

Re-design of the reference's ``modules/`` package:

- sinusoidal positional encoding  (``modules/encoding.py:5-20``)
- post-LN residual blocks, LayerNorm without affine params
  (``modules/encoder.py:29-35``, ``modules/decoder.py:33-41``)
- ReLU feed-forward d_model -> 4*d_model -> d_model
  (``modules/feedforward.py:9-23``)
- multi-head attention with static string dispatch over the op zoo
  (``modules/multi_head_attention.py:16-92``)

Behavioral deltas (documented; SURVEY.md section 7): attention-op params
(convs, Fourier weights) are owned and trained rather than re-randomized
every forward, and head/sequence layout is kept clean through the dispatch
instead of the reference's interleaving reshapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

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
from fine_grained_gaussian_process_forcasting_tpu.ops.fourier import FourierBlock
from fine_grained_gaussian_process_forcasting_tpu.ops.probsparse import (
    prob_sparse_attention,
)

ATTENTION_TYPES = (
    "basic",
    "ATA",
    "ACAT",
    "conv_attn",
    "autoformer",
    "informer",
    "fedformer",
)


def positional_encoding(length: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal table (1, length, d_model) (``modules/encoding.py:8-16``)."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.power(
        10000.0, jnp.arange(0, d_model, 2, dtype=jnp.float32) / d_model
    )
    x = pos / div  # (length, ceil(d_model/2))
    pe = jnp.zeros((length, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(x))
    pe = pe.at[:, 1::2].set(jnp.cos(x[:, : d_model // 2]))
    return pe[None].astype(dtype)


class FeedForward(nn.Module):
    """ReLU MLP (``modules/feedforward.py``)."""

    d_model: int
    d_ff: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.d_ff, dtype=self.dtype, name="w1")(x))
        return nn.Dense(self.d_model, dtype=self.dtype, name="w2")(h)


class MultiHeadAttention(nn.Module):
    """Q/K/V projection + static dispatch over the attention-op zoo
    (``modules/multi_head_attention.py:16-92``).

    ``attn_type`` selects the op at trace time; for ``informer``, a
    'sampling' PRNG stream drives key sampling when provided (falls back to
    a fixed key, making eval deterministic).
    """

    d_model: int
    d_k: int
    d_v: int
    n_heads: int
    attn_type: str = "basic"
    fedformer_seq_len: int = 96  # hardcoded in the reference dispatcher (:69)
    fedformer_modes: int = 8
    dtype: Optional[jnp.dtype] = None
    use_pallas_attention: Optional[bool] = None  # None = auto: d_k>=64

    @nn.compact
    def __call__(self, q_in, k_in, v_in, training: bool = False) -> jnp.ndarray:
        b = q_in.shape[0]
        h, d_k, d_v = self.n_heads, self.d_k, self.d_v

        if self.attn_type == "fedformer":
            # The reference routes fedformer through AutoCorrelationLayer,
            # which owns its q/k/v/out projections
            # (``layers/AutoCorrelation.py:144-176``), then applies the
            # dispatcher's fc on top (``multi_head_attention.py:72-73,91``).
            L, S = q_in.shape[1], k_in.shape[1]
            qs = nn.Dense(d_k * h, name="fed_q")(q_in).reshape(b, L, h, -1)
            block = FourierBlock(
                in_channels=self.d_model,
                out_channels=self.d_model,
                seq_len=self.fedformer_seq_len,
                modes=self.fedformer_modes,
                mode_select_method="random",
                n_heads=h,
                name="fourier_block",
            )
            out, _ = block(qs)
            out = nn.Dense(self.d_model, name="fed_out")(out.reshape(b, L, -1))
            return nn.Dense(self.d_model, use_bias=False, name="fc")(out)

        is_self = q_in is k_in and k_in is v_in
        if is_self:
            # Self-attention: one fused QKV GEMM.  At the reference's dims
            # the separate projections are (., 32)@(32, 32) — N=32 fills a
            # quarter of the 128-wide MXU lanes; fusing to N=2*h*d_k+h*d_v
            # triples the useful width per dispatch.
            qkv = nn.Dense(2 * d_k * h + d_v * h, use_bias=False,
                           dtype=self.dtype, name="wqkv")(q_in)
            q = qkv[..., : d_k * h]
            k = qkv[..., d_k * h : 2 * d_k * h]
            v = qkv[..., 2 * d_k * h :]
        else:
            q = nn.Dense(d_k * h, use_bias=False, dtype=self.dtype,
                         name="wq")(q_in)
            k = nn.Dense(d_k * h, use_bias=False, dtype=self.dtype,
                         name="wk")(k_in)
            v = nn.Dense(d_v * h, use_bias=False, dtype=self.dtype,
                         name="wv")(v_in)

        def split(x, d):
            return x.reshape(b, -1, h, d).transpose(0, 2, 1, 3)

        q, k, v = split(q, d_k), split(k, d_k), split(v, d_v)

        # conv-family ops keep their boolean opt-in (their pallas route is
        # unmeasured at production dims); auto (None) resolves to False
        if self.attn_type == "ATA":
            context, _ = ATAAttention(
                d_k=d_k, n_heads=h, name="ata",
                use_pallas_attention=bool(self.use_pallas_attention))(q, k, v)
        elif self.attn_type == "ACAT":
            context, _ = ACATAttention(d_k=d_k, n_heads=h, name="acat")(q, k, v)
        elif self.attn_type == "conv_attn":
            context, _ = ConvAttnAttention(
                d_k=d_k, n_heads=h, name="conv_attn",
                use_pallas_attention=bool(self.use_pallas_attention))(q, k, v)
        elif self.attn_type == "autoformer":
            # batch-shared delay aggregator in training, per-sample in eval
            # (reference model.train()/eval(), ``Autoformer.py:118-121``)
            context, _ = auto_correlation(q, k, v, training=training)
        elif self.attn_type == "informer":
            if self.has_rng("sampling"):
                rng = self.make_rng("sampling")
            else:
                rng = jax.random.PRNGKey(0)
            context, _ = prob_sparse_attention(q, k, v, rng)
        elif self.attn_type == "basic":
            # Route resolution (round 5): None = auto — on accelerator
            # backends the Pallas route ships as the default at every
            # head dim, with the variant picked by d_k below; both
            # endpoints are measured WHOLE-STEP wins on v5e
            # (results_r5/perf_scale_attn_ab.log: flash kernel +8.6%
            # bf16 at d512/d_k=64; results_r5/perf_flagship_route.log:
            # head-folded kernel +7.9% at flagship d_k=4).  On CPU,
            # tiny head dims resolve to XLA so the test tier does not
            # crawl through pallas interpret mode (kernel-vs-XLA parity
            # is covered by explicit-flag tests in
            # tests/test_pallas_kernels.py).  Explicit True/False still
            # force either path.
            # At d_k >= 128 XLA retakes the lead (d1024/d_k=128: XLA
            # 56.15 ms vs pallas 57.34, results_r5/perf_d1024.log), so
            # auto caps the pallas route below it.  Cross-attention is
            # variant-dependent: the flash kernel loses it (prod
            # dec-cross XLA 0.912 ms vs pallas 1.133, softmax_ab.log;
            # self-only gating wins the d512 step 52.85 -> 49.69 ms,
            # perf_selfgate.log) but the head-folded kernel keeps it
            # (flagship all-pallas 19.27 ms vs self-only 19.81,
            # perf_flagship_route.log).
            if self.use_pallas_attention is None:
                use_pallas = (d_k < 128
                              and (is_self or d_k < 64)
                              and (d_k >= 64
                                   or jax.default_backend() != "cpu"))
            else:
                use_pallas = self.use_pallas_attention
            if use_pallas:
                if d_k >= 64:
                    # lane-filling head dim: the per-(batch, head) fused
                    # softmax kernel (no lane padding; scores/probs never
                    # touch HBM)
                    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.flash_attention import (
                        fused_attention,
                    )

                    context = fused_attention(q, k, v)
                else:
                    # tiny head dim: fold heads into lanes (4x HBM padding
                    # instead of the per-head kernel's 32x)
                    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.head_folded_attention import (
                        head_folded_attention,
                    )

                    context = head_folded_attention(q, k, v)
            else:
                context, _ = scaled_dot_attention(q, k, v)
        else:
            raise ValueError(f"unknown attn_type {self.attn_type!r}")

        context = context.transpose(0, 2, 1, 3).reshape(b, -1, h * d_v)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        name="fc")(context)


class EncoderLayer(nn.Module):
    """Self-attn -> LN -> FFN -> LN, both post-norm without affine
    (``modules/encoder.py:11-35``)."""

    d_model: int
    d_ff: int
    d_k: int
    d_v: int
    n_heads: int
    attn_type: str
    dtype: Optional[jnp.dtype] = None
    use_pallas_attention: Optional[bool] = None  # None = auto: d_k>=64

    @nn.compact
    def __call__(self, x, training: bool = False):
        ln = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False,
                          dtype=self.dtype)
        attn_out = MultiHeadAttention(
            d_model=self.d_model, d_k=self.d_k, d_v=self.d_v,
            n_heads=self.n_heads, attn_type=self.attn_type,
            dtype=self.dtype,
            use_pallas_attention=self.use_pallas_attention,
            name="self_attn",
        )(x, x, x, training=training)
        out = ln(attn_out + x)
        ffn_out = FeedForward(self.d_model, self.d_ff, dtype=self.dtype,
                              name="ffn")(out)
        return ln(ffn_out + out)


class DecoderLayer(nn.Module):
    """Self-attn, cross-attn, FFN with post-LN (``modules/decoder.py:11-41``)."""

    d_model: int
    d_ff: int
    d_k: int
    d_v: int
    n_heads: int
    attn_type: str
    dtype: Optional[jnp.dtype] = None
    use_pallas_attention: Optional[bool] = None  # None = auto: d_k>=64

    @nn.compact
    def __call__(self, x, enc_out, training: bool = False):
        ln = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False,
                          dtype=self.dtype)
        kw = dict(
            d_model=self.d_model, d_k=self.d_k, d_v=self.d_v,
            n_heads=self.n_heads, attn_type=self.attn_type,
            dtype=self.dtype,
            use_pallas_attention=self.use_pallas_attention,
        )
        out = ln(x + MultiHeadAttention(**kw, name="self_attn")(
            x, x, x, training=training))
        out2 = ln(out + MultiHeadAttention(**kw, name="cross_attn")(
            out, enc_out, enc_out, training=training))
        out3 = ln(out2 + FeedForward(self.d_model, self.d_ff, dtype=self.dtype,
                                     name="ffn")(out2))
        return out3


class Encoder(nn.Module):
    d_model: int
    d_ff: int
    d_k: int
    d_v: int
    n_heads: int
    n_layers: int
    attn_type: str
    dtype: Optional[jnp.dtype] = None
    use_pallas_attention: Optional[bool] = None  # None = auto: d_k>=64

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = x + positional_encoding(x.shape[1], self.d_model, x.dtype)
        for i in range(self.n_layers):
            x = EncoderLayer(
                d_model=self.d_model, d_ff=self.d_ff, d_k=self.d_k,
                d_v=self.d_v, n_heads=self.n_heads, attn_type=self.attn_type,
                dtype=self.dtype,
                use_pallas_attention=self.use_pallas_attention,
                name=f"layer{i}",
            )(x, training=training)
        return x


class Decoder(nn.Module):
    d_model: int
    d_ff: int
    d_k: int
    d_v: int
    n_heads: int
    n_layers: int
    attn_type: str
    dtype: Optional[jnp.dtype] = None
    use_pallas_attention: Optional[bool] = None  # None = auto: d_k>=64

    @nn.compact
    def __call__(self, x, enc_out, training: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = x + positional_encoding(x.shape[1], self.d_model, x.dtype)
        for i in range(self.n_layers):
            x = DecoderLayer(
                d_model=self.d_model, d_ff=self.d_ff, d_k=self.d_k,
                d_v=self.d_v, n_heads=self.n_heads, attn_type=self.attn_type,
                dtype=self.dtype,
                use_pallas_attention=self.use_pallas_attention,
                name=f"layer{i}",
            )(x, enc_out, training=training)
        return x


class Transformer(nn.Module):
    """Seq2seq transformer over already-embedded (b, l, d_model) inputs
    (``modules/transformer.py:9-43``).  Returns (enc_out, dec_out).
    """

    d_model: int
    d_ff: int
    d_k: int
    d_v: int
    n_heads: int
    n_layers: int
    attn_type: str = "basic"
    dtype: Optional[jnp.dtype] = None  # compute dtype (e.g. bfloat16)
    use_pallas_attention: Optional[bool] = None  # None = auto: d_k>=64

    @nn.compact
    def __call__(self, enc_inputs, dec_inputs,
                 training: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kw = dict(
            d_model=self.d_model, d_ff=self.d_ff, d_k=self.d_k, d_v=self.d_v,
            n_heads=self.n_heads, n_layers=self.n_layers,
            attn_type=self.attn_type, dtype=self.dtype,
            use_pallas_attention=self.use_pallas_attention,
        )
        in_dtype = enc_inputs.dtype
        enc_out = Encoder(**kw, name="encoder")(enc_inputs, training=training)
        dec_out = Decoder(**kw, name="decoder")(dec_inputs, enc_out,
                                                training=training)
        return enc_out.astype(in_dtype), dec_out.astype(in_dtype)

"""Pallas kernel parity tests (interpret mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from fine_grained_gaussian_process_forcasting_tpu.gp.kernels import rbf_ard
from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.rbf import (
    rbf_cross_kernel,
)


def _inputs(batch=(), n=37, m=19, d=5, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(*batch, n, d)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    ls = jnp.asarray(rng.uniform(0.5, 2.0, size=(d,)).astype(np.float32))
    os_ = jnp.asarray(np.float32(1.3))
    return x, z, ls, os_


def test_rbf_pallas_matches_xla():
    x, z, ls, os_ = _inputs()
    ref = rbf_ard(x, z, ls, os_)
    got = rbf_cross_kernel(x, z, ls, os_)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_rbf_pallas_batched():
    x, z, ls, os_ = _inputs(batch=(3,), n=21, m=8)
    ref = rbf_ard(x, z, ls, os_)
    got = rbf_cross_kernel(x, z, ls, os_)
    assert got.shape == (3, 21, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_rbf_pallas_gradients_match():
    x, z, ls, os_ = _inputs(n=16, m=12, d=4)

    def loss_pallas(x, z, ls, os_):
        k = rbf_cross_kernel(x, z, ls, os_)
        return jnp.sum(jnp.sin(k) * k)

    def loss_ref(x, z, ls, os_):
        k = rbf_ard(x, z, ls, os_)
        return jnp.sum(jnp.sin(k) * k)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, z, ls, os_)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, z, ls, os_)
    for gp_, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(gp_), np.asarray(gr),
                                   rtol=2e-3, atol=1e-4)


def test_deep_gp_with_pallas_matches():
    from fine_grained_gaussian_process_forcasting_tpu.gp import DeepGP

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 11, 6))
    gp_ref = DeepGP(input_dims=6, num_inducing=8, use_pallas=False)
    gp_pal = DeepGP(input_dims=6, num_inducing=8, use_pallas=True)
    variables = gp_ref.init(jax.random.PRNGKey(1), x)
    post_ref = gp_ref.apply(variables, x)
    post_pal = gp_pal.apply(variables, x)
    np.testing.assert_allclose(np.asarray(post_pal.mean),
                               np.asarray(post_ref.mean), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(post_pal.var),
                               np.asarray(post_ref.var), rtol=1e-4,
                               atol=1e-5)


def test_batched_cholesky_matches_xla():
    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.cholesky import (
        batched_cholesky,
    )

    rng = np.random.default_rng(7)
    for b, n in [(3, 64), (2, 100), (4, 192)]:
        x = rng.normal(size=(b, n, n)).astype(np.float32)
        a = jnp.asarray(x @ x.transpose(0, 2, 1) + 5 * np.eye(n, dtype=np.float32))
        got = batched_cholesky(a)
        ref = jnp.linalg.cholesky(a)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


def test_batched_cholesky_gradients():
    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.cholesky import (
        batched_cholesky,
    )

    rng = np.random.default_rng(8)
    n = 32
    x = rng.normal(size=(2, n, n)).astype(np.float32)
    a = jnp.asarray(x @ x.transpose(0, 2, 1) + 5 * np.eye(n, dtype=np.float32))

    def f_pallas(a):
        return jnp.sum(jnp.sin(batched_cholesky(a)))

    def f_ref(a):
        return jnp.sum(jnp.sin(jnp.linalg.cholesky(a)))

    g_pallas = jax.grad(f_pallas)(a)
    g_ref = jax.grad(f_ref)(a)
    # reference grad is only defined up to the symmetric part used
    sym = lambda m: 0.5 * (m + np.swapaxes(np.asarray(m), -1, -2))
    np.testing.assert_allclose(sym(g_pallas), sym(g_ref), rtol=2e-3,
                               atol=2e-3)


def test_fused_attention_matches_reference():
    from fine_grained_gaussian_process_forcasting_tpu.ops.attention import (
        scaled_dot_attention,
    )
    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.flash_attention import (
        fused_attention,
    )

    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(2, 3, 24, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 3, 16, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 3, 16, 4)).astype(np.float32))
    got = fused_attention(q, k, v)
    ref, _ = scaled_dot_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_fused_attention_gradients():
    from fine_grained_gaussian_process_forcasting_tpu.ops.attention import (
        scaled_dot_attention,
    )
    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.flash_attention import (
        fused_attention,
    )

    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.normal(size=(1, 2, 12, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 12, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 12, 4)).astype(np.float32))

    g_fused = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(fused_attention(q, k, v))),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(scaled_dot_attention(q, k, v)[0])),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-4)


def test_small_head_attention_matches_reference():
    from fine_grained_gaussian_process_forcasting_tpu.ops.attention import (
        scaled_dot_attention,
    )
    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.small_head_attention import (
        small_head_attention,
    )

    rng = np.random.default_rng(20)
    q = jnp.asarray(rng.normal(size=(2, 3, 24, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 3, 16, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 3, 16, 4)).astype(np.float32))
    got = small_head_attention(q, k, v)
    ref, _ = scaled_dot_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_small_head_attention_gradients():
    from fine_grained_gaussian_process_forcasting_tpu.ops.attention import (
        scaled_dot_attention,
    )
    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.small_head_attention import (
        small_head_attention,
    )

    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.normal(size=(1, 2, 12, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 12, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 12, 4)).astype(np.float32))
    g_got = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(small_head_attention(q, k, v))),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(scaled_dot_attention(q, k, v)[0])),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-4)


def test_head_folded_attention_matches_reference():
    from fine_grained_gaussian_process_forcasting_tpu.ops.attention import (
        scaled_dot_attention,
    )
    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.head_folded_attention import (
        head_folded_attention,
    )

    rng = np.random.default_rng(5)
    b, h, lq, lk, d = 2, 8, 24, 16, 4
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)).astype(np.float32))
    got = head_folded_attention(q, k, v)
    want, _ = scaled_dot_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv_family_pallas_attention_matches_xla():
    """ATA/conv_attn with use_pallas_attention route their final softmax
    attention through the head-folded kernel — same outputs and grads."""
    from fine_grained_gaussian_process_forcasting_tpu.ops.conv_attention import (
        ATAAttention,
        ConvAttnAttention,
    )

    rng = np.random.default_rng(7)
    b, h, l, d = 2, 4, 16, 4
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
               for _ in range(3))
    for cls in (ATAAttention, ConvAttnAttention):
        ref_mod = cls(d_k=d, n_heads=h)
        pal_mod = cls(d_k=d, n_heads=h, use_pallas_attention=True)
        params = ref_mod.init(jax.random.PRNGKey(0), q, k, v)

        def loss(mod):
            return lambda p: jnp.sum(jnp.sin(mod.apply(p, q, k, v)[0]))

        ref_val, ref_grad = jax.value_and_grad(loss(ref_mod))(params)
        pal_val, pal_grad = jax.value_and_grad(loss(pal_mod))(params)
        np.testing.assert_allclose(float(pal_val), float(ref_val),
                                   rtol=1e-5, atol=1e-5)
        for a, b_ in zip(jax.tree_util.tree_leaves(pal_grad),
                         jax.tree_util.tree_leaves(ref_grad)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


def test_head_folded_attention_gradients():
    from fine_grained_gaussian_process_forcasting_tpu.ops.attention import (
        scaled_dot_attention,
    )
    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.head_folded_attention import (
        head_folded_attention,
    )

    rng = np.random.default_rng(6)
    b, h, l, d = 2, 4, 16, 4
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
               for _ in range(3))
    g1 = jax.grad(lambda q, k, v: jnp.sum(
        jnp.sin(head_folded_attention(q, k, v))), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(
        jnp.sin(scaled_dot_attention(q, k, v)[0])), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_attention_route_auto_is_shape_gated():
    """Round-5 promotion contract: use_pallas_attention=None (the shipped
    default) routes the basic path to the fused Pallas kernel exactly when
    d_k >= 64 (the measured whole-step d512 win,
    results_r5/perf_scale_attn_ab.log), stays on XLA at the reference's
    tiny head dims, and explicit True/False still force either path."""
    from fine_grained_gaussian_process_forcasting_tpu.models.transformer import (
        MultiHeadAttention,
    )

    def uses_pallas(d_model, h, flag):
        m = MultiHeadAttention(d_model=d_model, d_k=d_model // h,
                               d_v=d_model // h, n_heads=h,
                               attn_type="basic", use_pallas_attention=flag)
        x = jnp.ones((2, 8, d_model))
        p = m.init(jax.random.PRNGKey(0), x, x, x)
        return "pallas" in str(
            jax.make_jaxpr(lambda v: m.apply(v, x, x, x))(p))

    assert uses_pallas(256, 4, None)        # auto, d_k=64 self -> pallas
    assert not uses_pallas(32, 8, None)     # auto, d_k=4 on CPU -> XLA
    assert not uses_pallas(512, 4, None)    # auto, d_k=128 -> XLA retakes
    assert uses_pallas(32, 8, True)         # forced on
    assert not uses_pallas(256, 4, False)   # forced off

    # cross-attention (distinct q/k arrays) stays on XLA under auto —
    # measured loser for the kernel (results_r4/softmax_ab.log dec-cross)
    m = MultiHeadAttention(d_model=256, d_k=64, d_v=64, n_heads=4,
                           attn_type="basic", use_pallas_attention=None)
    q = jnp.ones((2, 8, 256))
    kv = jnp.ones((2, 16, 256))
    p_ = m.init(jax.random.PRNGKey(0), q, kv, kv)
    assert "pallas" not in str(
        jax.make_jaxpr(lambda v: m.apply(v, q, kv, kv))(p_))

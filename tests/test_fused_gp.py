"""Fused whitened-GP marginal kernel vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.fused_gp import (
    whitened_marginals,
)


def _ref_marginals(xs, zs, u, w, os_):
    """Straight jnp implementation of the same algebra."""
    d2 = (jnp.sum(xs**2, -1)[..., :, None] + jnp.sum(zs**2, -1)[None, :]
          - 2.0 * jnp.einsum("...nd,md->...nm", xs, zs))
    k = os_ * jnp.exp(-0.5 * d2)
    mean_k = jnp.einsum("...nm,m->...n", k, u)
    var = os_ - jnp.einsum("...nm,...nm->...n", k @ w, k)
    return mean_k, var


def _inputs(b=3, n=40, d=5, m=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    xs = jax.random.normal(ks[0], (b, n, d))
    zs = jax.random.normal(ks[1], (m, d))
    u = jax.random.normal(ks[2], (m,))
    lw = jax.random.normal(ks[3], (m, m)) * 0.1
    s2 = jax.nn.softplus(jax.random.normal(ks[4], (m,)))
    w = lw.T @ (lw * (1.0 - s2)[:, None])  # symmetric, like L^-T D L^-1
    w = 0.5 * (w + w.T)
    os_ = jnp.asarray(1.3)
    return xs, zs, u, w, os_


def test_fused_forward_matches_reference():
    args = _inputs()
    got_mean, got_var = jax.jit(whitened_marginals)(*args)
    want_mean, want_var = _ref_marginals(*args)
    np.testing.assert_allclose(got_mean, want_mean, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_var, want_var, rtol=2e-5, atol=2e-5)


def test_fused_gradients_match_reference():
    args = _inputs(seed=3)

    def loss(fn, xs, zs, u, w, os_):
        mean, var = fn(xs, zs, u, w, os_)
        # distinct nonlinear weights so both cotangents are exercised
        return jnp.sum(jnp.sin(mean) * 1.7) + jnp.sum(var**2) * 0.3

    grads_got = jax.grad(lambda *a: loss(whitened_marginals, *a),
                         argnums=(0, 1, 2, 3, 4))(*args)
    grads_want = jax.grad(lambda *a: loss(_ref_marginals, *a),
                          argnums=(0, 1, 2, 3, 4))(*args)
    for g, w_, name in zip(grads_got, grads_want,
                           ["xs", "zs", "u", "w", "os"]):
        np.testing.assert_allclose(g, w_, rtol=3e-4, atol=3e-5,
                                   err_msg=f"grad {name}")


def test_fused_gradient_w_symmetric_cotangent():
    """dW from the kernel must equal the reference even though only the
    symmetric part matters downstream."""
    args = _inputs(seed=5)

    def var_sum(fn, w):
        _, var = fn(args[0], args[1], args[2], w, args[4])
        return jnp.sum(var)

    dw_got = jax.grad(lambda w: var_sum(whitened_marginals, w))(args[3])
    dw_want = jax.grad(lambda w: var_sum(_ref_marginals, w))(args[3])
    np.testing.assert_allclose(dw_got, dw_want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("n", [40, 240])
def test_deep_gp_fused_matches_xla_path(n):
    """DeepGP(use_fused=True) == DeepGP(use_fused=False): posterior and
    parameter gradients, at a lane-aligned and a non-aligned N."""
    from fine_grained_gaussian_process_forcasting_tpu.gp.deep_gp import (
        DeepGP,
        variational_elbo,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (4, n, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, n))

    def run(use_fused):
        gp = DeepGP(input_dims=8, num_inducing=16, use_fused=use_fused)
        params = gp.init({"params": jax.random.PRNGKey(7)}, x)["params"]

        def loss(p):
            post = gp.apply({"params": p}, x)
            return -variational_elbo(y, post, num_data=8) + 0.1 * jnp.sum(
                post.mean**2)

        val, grads = jax.value_and_grad(loss)(params)
        return val, grads, gp.apply({"params": params}, x)

    v_f, g_f, post_f = run(True)
    v_x, g_x, post_x = run(False)
    np.testing.assert_allclose(v_f, v_x, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(post_f.mean, post_x.mean, rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(post_f.var, post_x.var, rtol=2e-5, atol=2e-5)
    key = lambda kv: str(kv[0])
    for (kf, gf), (kx, gx) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_f), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(g_x), key=key)):
        np.testing.assert_allclose(gf, gx, rtol=5e-4, atol=5e-5,
                                   err_msg=str(kf))


def test_fused_multilayer_falls_back_cleanly():
    """hidden_dims layers are batched GPs (vmapped); the fused flag must
    not break them (falls back to the XLA path for batched layers)."""
    from fine_grained_gaussian_process_forcasting_tpu.gp.deep_gp import DeepGP

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 6))
    gp = DeepGP(input_dims=6, num_inducing=8, hidden_dims=(4,),
                use_fused=True)
    params = gp.init({"params": jax.random.PRNGKey(1),
                      "noise": jax.random.PRNGKey(2)}, x)["params"]
    post = gp.apply({"params": params}, x,
                    rngs={"noise": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(post.mean)).all()
    assert (np.asarray(post.var) > 0).all()


def test_affine_kernel_matches_composed_math():
    """whitened_marginals_affine == scale-outside + LinearMean-outside
    composition, values and all 8 gradients (round 3: the scaling and
    mean epilogue moved inside the kernel — 0.41 ms of the flagship
    segment; RESULTS.md)."""
    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas import (
        fused_gp,
    )

    b, n, d, m = 3, 50, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, d))
    zs = jax.random.normal(jax.random.PRNGKey(1), (m, d))
    u = jax.random.normal(jax.random.PRNGKey(2), (m,)) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(3), (m, m)) * 0.05
    w = w @ w.T
    os_ = jnp.asarray(1.3)
    ils = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (d,))) + 0.5
    mw = jax.random.normal(jax.random.PRNGKey(5), (d,)) / d
    mb = jnp.asarray(0.7)

    def composed(x, zs, u, w, os_, ils, mw, mb):
        mk, v = fused_gp.whitened_marginals(x * ils, zs, u, w, os_)
        return mk + jnp.einsum("bnd,d->bn", x, mw) + mb, v

    def loss(f, *a):
        mean, var = f(*a)
        return jnp.sum(jnp.sin(mean)) + jnp.sum(var * var)

    args = (x, zs, u, w, os_, ils, mw, mb)
    m1, v1 = composed(*args)
    m2, v2 = fused_gp.whitened_marginals_affine(*args)
    np.testing.assert_allclose(m1, m2, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(v1, v2, rtol=2e-5, atol=2e-5)
    g1 = jax.grad(lambda *a: loss(composed, *a),
                  argnums=tuple(range(8)))(*args)
    g2 = jax.grad(lambda *a: loss(fused_gp.whitened_marginals_affine, *a),
                  argnums=tuple(range(8)))(*args)
    for i, (ga, gb) in enumerate(zip(g1, g2)):
        np.testing.assert_allclose(ga, gb, rtol=5e-5, atol=5e-5,
                                   err_msg=f"grad {i}")

"""GP stack validation against closed-form small-n math (SURVEY.md s7 step 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fine_grained_gaussian_process_forcasting_tpu.gp import (
    DeepGP,
    exact_gp_mll,
    exact_gp_posterior,
    init_exact_gp,
    rbf_ard,
    sq_dist,
)
from fine_grained_gaussian_process_forcasting_tpu.gp.deep_gp import (
    GPPosterior,
    gaussian_expected_log_prob,
    variational_elbo,
)


def test_sq_dist_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 3)).astype(np.float32)
    z = rng.normal(size=(7, 3)).astype(np.float32)
    naive = ((x[:, None, :] - z[None, :, :]) ** 2).sum(-1)
    got = np.asarray(sq_dist(jnp.asarray(x), jnp.asarray(z)))
    np.testing.assert_allclose(got, naive, rtol=1e-4, atol=1e-5)


def test_rbf_kernel_properties():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    ls = jnp.asarray([0.5, 1.0, 2.0, 0.7])
    os_ = jnp.asarray(1.3)
    k = rbf_ard(x, x, ls, os_)
    np.testing.assert_allclose(np.diag(np.asarray(k)), 1.3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k).T, rtol=1e-5)
    assert np.all(np.linalg.eigvalsh(np.asarray(k)) > -1e-5)


def _naive_whitened_posterior(x, z, ls, os_, m, s, mean_w, mean_b):
    """Dense-matrix reference for the whitened variational marginals."""
    kzz = np.asarray(rbf_ard(jnp.asarray(z), jnp.asarray(z), ls, os_))
    kzz = kzz + 1e-4 * np.eye(len(z))
    L = np.linalg.cholesky(kzz)
    kzx = np.asarray(rbf_ard(jnp.asarray(z), jnp.asarray(x), ls, os_))  # (M, N)
    A = np.linalg.solve(L, kzx)  # (M, N)
    mean = x @ np.asarray(mean_w) + mean_b + A.T @ m
    var = float(os_) - (A**2).sum(0) + ((s[:, None] * A) ** 2).sum(0)
    return mean, var


def test_deep_gp_matches_naive_whitened_math():
    d, M, N = 3, 16, 11
    rng = np.random.default_rng(2)
    x = rng.normal(size=(N, d)).astype(np.float32)

    gp = DeepGP(input_dims=d, num_inducing=M)
    variables = gp.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(lambda v: v, variables["params"])
    # randomize the variational params so the test is non-trivial
    layer = dict(params["output_layer"])
    layer["variational_mean"] = jnp.asarray(
        rng.normal(size=(M,)).astype(np.float32)
    )
    layer["variational_log_stddev"] = jnp.asarray(
        rng.normal(size=(M,), scale=0.3).astype(np.float32)
    )
    params = dict(params)
    params["output_layer"] = layer

    post = gp.apply({"params": params}, jnp.asarray(x))

    ls = jax.nn.softplus(layer["raw_lengthscale"])
    os_ = jax.nn.softplus(layer["raw_outputscale"])
    mean_ref, var_ref = _naive_whitened_posterior(
        x,
        np.asarray(layer["inducing_points"]),
        ls,
        os_,
        np.asarray(layer["variational_mean"]),
        np.exp(np.asarray(layer["variational_log_stddev"])),
        layer["mean_weight"],
        float(layer["mean_bias"]),
    )
    np.testing.assert_allclose(np.asarray(post.mean), mean_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(post.var), var_ref, rtol=1e-3, atol=1e-4)

    # KL of N(m, diag(s^2)) vs N(0, I)
    m = np.asarray(layer["variational_mean"])
    log_s = np.asarray(layer["variational_log_stddev"])
    kl_ref = 0.5 * np.sum(np.exp(2 * log_s) + m**2 - 1 - 2 * log_s)
    np.testing.assert_allclose(float(post.kl), kl_ref, rtol=1e-4)


def test_deep_gp_batched_inputs():
    gp = DeepGP(input_dims=4, num_inducing=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 9, 4))
    variables = gp.init(jax.random.PRNGKey(0), x)
    post = gp.apply(variables, x)
    assert post.mean.shape == (5, 9)
    assert post.var.shape == (5, 9)
    assert np.all(np.asarray(post.var) > 0)


def test_expected_log_prob_matches_monte_carlo():
    rng = np.random.default_rng(3)
    mean = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.1, 1.0, size=(4,)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    noise = jnp.asarray(0.5)
    post = GPPosterior(mean=mean, var=var, kl=jnp.zeros(()), noise=noise)
    got = np.asarray(gaussian_expected_log_prob(y, post))

    # Monte Carlo over f ~ N(mean, var)
    f = rng.normal(size=(200000, 4)) * np.sqrt(np.asarray(var)) + np.asarray(mean)
    logp = -0.5 * ((np.asarray(y) - f) ** 2 / 0.5 + np.log(2 * np.pi * 0.5))
    np.testing.assert_allclose(got, logp.mean(0), rtol=5e-3, atol=5e-3)


def test_variational_elbo_scaling():
    post = GPPosterior(
        mean=jnp.zeros((2, 8)),
        var=jnp.ones((2, 8)) * 0.1,
        kl=jnp.asarray(3.0),
        noise=jnp.asarray(1.0),
    )
    y = jnp.zeros((2, 8))
    e16 = float(variational_elbo(y, post, num_data=16))
    e32 = float(variational_elbo(y, post, num_data=32))
    # larger num_data => smaller KL penalty => larger ELBO
    assert e32 > e16
    ell = -0.5 * (0.1 / 1.0 + np.log(2 * np.pi))
    np.testing.assert_allclose(e16, ell - 3.0 / 16, rtol=1e-5)


def test_exact_gp_recovers_function():
    rng = np.random.default_rng(4)
    x = jnp.asarray(np.linspace(-2, 2, 40).reshape(-1, 1).astype(np.float32))
    y = jnp.sin(2 * x[:, 0]) + 0.01 * jnp.asarray(
        rng.normal(size=(40,)).astype(np.float32)
    )
    params = init_exact_gp(1)
    mean, var = exact_gp_posterior(params, x, y, x)
    # posterior should interpolate training data far better than the prior
    assert float(jnp.mean((mean - y) ** 2)) < 0.2
    assert np.all(np.asarray(var) >= 0)
    mll = float(exact_gp_mll(params, x, y))
    assert np.isfinite(mll)


def test_exact_gp_blur_module():
    from fine_grained_gaussian_process_forcasting_tpu.gp.exact_blur import (
        ExactGPBlur,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 12, 4))
    y = jax.random.normal(jax.random.PRNGKey(1), (3, 12))
    mod = ExactGPBlur(input_dims=4, use_pallas=True)
    variables = mod.init(jax.random.PRNGKey(2), x, y)
    mean, mll = mod.apply(variables, x, y)
    assert mean.shape == (3, 12)
    assert np.isfinite(float(mll))
    # smoothing regularizes: the posterior mean has no larger norm than a
    # noiseless interpolation of the projection
    z = np.einsum("bsd,d->bs", np.asarray(x),
                  np.asarray(variables["params"]["mean_weight"])) + float(
                      variables["params"]["mean_bias"])
    assert np.linalg.norm(np.asarray(mean)) <= np.linalg.norm(z) * 1.5


def test_composite_exact_gp_kind():
    from fine_grained_gaussian_process_forcasting_tpu.models import (
        ForecastDenoising,
    )

    model = ForecastDenoising(
        src_input_size=4, tgt_input_size=4, d_model=16, n_heads=4, d_k=4,
        stack_size=1, pred_len=8, attn_type="basic", gp=True, denoise=True,
        gp_kind="exact",
    )
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(size=(4, 24, 4)).astype(np.float32))
    dec = jnp.asarray(rng.normal(size=(4, 8, 4)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(4, 8, 1)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)}, enc, dec, y, training=True)
    out = model.apply(
        variables, enc, dec, y, training=True,
        rngs={"noise": jax.random.PRNGKey(3),
              "sampling": jax.random.PRNGKey(4)})
    assert np.isfinite(float(out.loss))

    def loss_fn(params):
        o = model.apply(
            {"params": params}, enc, dec, y, training=True,
            rngs={"noise": jax.random.PRNGKey(3),
                  "sampling": jax.random.PRNGKey(4)})
        return o.loss

    grads = jax.grad(loss_fn)(variables["params"])
    total = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads["deep_gp"]))
    assert total > 0.0


def test_deep_gp_multilayer():
    """Multi-layer deep GP: finite marginals, summed KLs, gradient flow."""
    gp = DeepGP(input_dims=4, num_inducing=8, hidden_dims=(3,))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 4))
    variables = gp.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(2)}, x)
    post = gp.apply(variables, x, rngs={"noise": jax.random.PRNGKey(3)})
    assert post.mean.shape == (2, 7)
    assert np.all(np.asarray(post.var) > 0)
    single = DeepGP(input_dims=4, num_inducing=8)
    v1 = single.init(jax.random.PRNGKey(0), x)
    kl_single = float(single.apply(v1, x).kl)
    # two layers of variational params at init: both KLs are ~0 (q = prior)
    assert np.isfinite(float(post.kl))

    def loss(params):
        p = gp.apply({"params": params}, x,
                     rngs={"noise": jax.random.PRNGKey(3)})
        return jnp.sum(p.mean ** 2) + jnp.sum(p.var)

    grads = jax.grad(loss)(variables["params"])
    total = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads["hidden_layer0"]))
    assert total > 0.0


def test_gram_gemms_pin_highest_precision():
    """The Gram GEMMs feeding a Cholesky must carry precision=HIGHEST.

    On TPU, DEFAULT matmul precision feeds the MXU single-pass bf16
    inputs; with fp32 norms that is an inconsistent |x|^2+|z|^2-2xz
    decomposition whose exp-amplified error makes K indefinite once
    lengthscales shrink — the root cause of the exact-blur field-run
    forward NaN (a finite, well-conditioned A whose factorization
    returned NaN; scripts/exact_blur_repro.py).  CPU executes either
    precision identically, so this pins the CONTRACT via the jaxpr.
    """
    from fine_grained_gaussian_process_forcasting_tpu.gp.exact_blur import (
        ExactGPBlur,
    )
    from fine_grained_gaussian_process_forcasting_tpu.gp.kernels import sq_dist

    def _all_dots(jaxpr, acc):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "dot_general":
                acc.append(eqn.params.get("precision"))
            for v in eqn.params.values():
                inner = getattr(v, "jaxpr", None)
                if inner is not None:
                    _all_dots(inner, acc)
        return acc

    x = jnp.zeros((6, 4))
    z = jnp.zeros((5, 4))
    # fp32 path: the cross-term dot must be HIGHEST
    jx = jax.make_jaxpr(lambda a, b: sq_dist(a, b))(x, z)
    precs = _all_dots(jx.jaxpr, [])
    assert any(p == (jax.lax.Precision.HIGHEST,) * 2 for p in precs), precs
    # explicit bf16 path keeps the fast single-pass GEMM (consistent by
    # construction: distances of the cast points)
    jx16 = jax.make_jaxpr(
        lambda a, b: sq_dist(a, b, compute_dtype=jnp.bfloat16))(x, z)
    precs16 = _all_dots(jx16.jaxpr, [])
    assert not any(p == (jax.lax.Precision.HIGHEST,) * 2 for p in precs16)

    blur = ExactGPBlur(input_dims=4)
    xb = jnp.zeros((2, 8, 4))
    variables = blur.init(jax.random.PRNGKey(0), xb)

    jb = jax.make_jaxpr(
        lambda v, a: blur.apply(v, a, method=ExactGPBlur._factor)
    )(variables, xb)
    precs_b = _all_dots(jb.jaxpr, [])
    assert any(p == (jax.lax.Precision.HIGHEST,) * 2 for p in precs_b), precs_b


def test_ls_init_auto_engages_the_gp():
    """ls_init<0 (auto sqrt(2d)) must make the GP component live.

    At the reference init (ls ~ 0.693) every cross-covariance between
    d=32-scale inputs and N(0,1) inducing points is ~exp(-d) ~ 0: the
    posterior stays pinned at the prior and gradients into the inducing
    geometry are ~1e-12 (measured on TPU — the basis of the
    "inducing-count invariance" analysis).  The auto init puts the
    lengthscale at the expected pairwise distance scale so the kernel
    engages from step one.
    """
    from fine_grained_gaussian_process_forcasting_tpu.gp.deep_gp import DeepGP

    d = 32
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16, d),
                    dtype=jnp.float32)

    def grad_norm_into_inducing(ls_init):
        gp = DeepGP(input_dims=d, num_inducing=64, use_fused=False,
                    ls_init=ls_init)
        v = gp.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, x)
        p = v["params"]
        # move q off the whitened fixed point so chol_inv matters
        p["output_layer"]["variational_mean"] = jnp.asarray(
            np.random.RandomState(2).randn(64), dtype=jnp.float32)

        def loss(p):
            post = gp.apply({"params": p}, x,
                            rngs={"noise": jax.random.PRNGKey(2)})
            return jnp.sum(post.mean ** 2) + jnp.sum(post.var)

        g = jax.grad(loss)(p)
        return float(jnp.linalg.norm(g["output_layer"]["inducing_points"]))

    inert = grad_norm_into_inducing(0.0)
    live = grad_norm_into_inducing(-1.0)
    assert inert < 1e-6, inert
    assert live > 1e-3, live
    # the explicit-value form gives softplus(raw) == value
    gp = DeepGP(input_dims=d, num_inducing=8, ls_init=5.0)
    v = gp.init({"params": jax.random.PRNGKey(0),
                 "noise": jax.random.PRNGKey(1)}, x)
    raw = v["params"]["output_layer"]["raw_lengthscale"]
    np.testing.assert_allclose(np.log1p(np.exp(np.asarray(raw))), 5.0,
                               rtol=1e-5)


def test_exact_blur_init_knobs():
    """Round-4 tuning knobs (gp/exact_blur.py ls_init/noise_init): the
    softplus-inverse inits land the constrained values exactly, and the
    reference default (raw zeros) is preserved when both are 0."""
    import numpy as np
    from fine_grained_gaussian_process_forcasting_tpu.gp.exact_blur import (
        ExactGPBlur,
    )
    from fine_grained_gaussian_process_forcasting_tpu.gp.kernels import (
        softplus,
    )

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 4)),
                    dtype=jnp.float32)
    ref = ExactGPBlur(input_dims=4)
    v = ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(v["params"]["raw_noise"]), 0.0)
    np.testing.assert_allclose(
        np.asarray(v["params"]["raw_lengthscale"]), 0.0)

    tuned = ExactGPBlur(input_dims=4, ls_init=-1.0, noise_init=0.1)
    vt = tuned.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        float(softplus(vt["params"]["raw_noise"])), 0.1, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(softplus(vt["params"]["raw_lengthscale"])),
        np.sqrt(8.0), rtol=1e-6)
    out = tuned.apply(vt, x)  # smooth() path stays finite
    assert np.all(np.isfinite(np.asarray(out[0] if isinstance(out, tuple)
                                         else out)))

"""GP covariance kernels (RBF-ARD, Matern, outputscale wrapper).

From-scratch replacements for the gpytorch kernels the reference uses
inside ``denoising_model/DeepGP.py:46-49`` (``ScaleKernel(RBFKernel(
ard_num_dims=d))``).  Everything is a pure function over explicit
parameters so the whole GP path jits into one fused XLA computation; the
squared-distance + exp epilogue also has a fused Pallas implementation in
``ops/pallas/rbf.py`` for the TPU hot path.

Parametrization follows gpytorch: positive constraints via softplus with
raw params initialized to 0 (=> lengthscale/outputscale ~= 0.6931 at init).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softplus(x):
    return jax.nn.softplus(x)


def sq_dist(x: jnp.ndarray, z: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Pairwise squared Euclidean distance.

    x: (..., N, d), z: (M, d) -> (..., N, M).  Computed as
    |x|^2 + |z|^2 - 2 x.z so the inner product rides the MXU.
    ``compute_dtype=bfloat16`` runs the inner-product GEMM at the MXU's
    native rate with fp32 accumulation (squared norms stay fp32, from the
    same cast values so the d^2 decomposition remains consistent).

    The fp32 path pins ``precision=HIGHEST``: TPU's DEFAULT matmul
    precision feeds the MXU single-pass bf16 inputs, so the cross term
    would carry ~2^-8 relative error while the norms stay exact fp32 —
    an INCONSISTENT decomposition whose error scales with |x/ls|^2.
    Once trained lengthscales shrink, exp(-0.5 d2) of that perturbation
    makes the Gram matrix indefinite beyond any reasonable jitter and
    the downstream Cholesky returns NaN (root-caused from a captured
    field-run divergence; scripts/exact_blur_repro.py reproduces both
    sides).  HIGHEST restores a consistent near-exact d2; the explicit
    bf16 path is consistent by construction (distances of the *cast*
    points) and keeps the fast single-pass GEMM.
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        z = z.astype(compute_dtype)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST
    xf = x.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    x2 = jnp.sum(xf * xf, axis=-1)[..., :, None]
    z2 = jnp.sum(zf * zf, axis=-1)[None, :]
    xz = jnp.einsum("...nd,md->...nm", x, z,
                    preferred_element_type=jnp.float32, precision=precision)
    return jnp.maximum(x2 + z2 - 2.0 * xz, 0.0)


def rbf_ard(
    x: jnp.ndarray,
    z: jnp.ndarray,
    lengthscale: jnp.ndarray,
    outputscale: jnp.ndarray,
    compute_dtype=None,
) -> jnp.ndarray:
    """Scaled RBF-ARD cross covariance: outputscale * exp(-0.5 * d^2).

    x: (..., N, d), z: (M, d), lengthscale: (d,), outputscale: scalar.
    """
    xs = x / lengthscale
    zs = z / lengthscale
    return outputscale * jnp.exp(-0.5 * sq_dist(xs, zs, compute_dtype))


def matern_ard(
    x: jnp.ndarray,
    z: jnp.ndarray,
    lengthscale: jnp.ndarray,
    outputscale: jnp.ndarray,
    nu: float = 2.5,
) -> jnp.ndarray:
    """Matern-nu ARD kernel (gpytorch ``MaternKernel`` equivalent; the
    reference imports it at ``DeepGP.py:7`` though the shipped config uses
    RBF)."""
    xs = x / lengthscale
    zs = z / lengthscale
    r = jnp.sqrt(sq_dist(xs, zs) + 1e-12)
    if nu == 0.5:
        k = jnp.exp(-r)
    elif nu == 1.5:
        a = jnp.sqrt(3.0) * r
        k = (1.0 + a) * jnp.exp(-a)
    elif nu == 2.5:
        a = jnp.sqrt(5.0) * r
        k = (1.0 + a + a * a / 3.0) * jnp.exp(-a)
    else:
        raise ValueError(f"unsupported nu={nu}")
    return outputscale * k

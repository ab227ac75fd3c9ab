"""Fused RBF cross-covariance Pallas kernel (with custom VJP).

Computes K[n, m] = outputscale * exp(-0.5 * ||(x_n - z_m)/l||^2) with the
inner product on the MXU and the squared-norm/exp epilogue on the VPU, in
one VMEM-resident pass — the GP hot path's cross-kernel
(``denoising_model/DeepGP.py:46-54`` via gpytorch; SURVEY.md s7 step 3).

The backward pass is closed-form in terms of the saved forward output
(dK/dx involves only K-weighted matmuls), so it runs as plain fused XLA:

    gK = g * K
    dL/dx~_n = (gK @ z~)_n - (sum_m gK[n,m]) x~_n          (x~ = x/l)
    dL/dz~_m = (gK^T @ x~)_m - (sum_n gK[n,m]) z~_m
    dL/dos   = sum(g * K) / os
    dL/dl_k  = -(dL/dx~ . x + dL/dz~ . z)_k / l_k^2

On CPU (tests) the kernel runs in interpreter mode automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256


def _rbf_body(x_ref, z_ref, os_ref, out_ref):
    x = x_ref[:]  # (TILE_N, dpad)
    z = z_ref[:]  # (M, dpad)
    xz = jnp.dot(x, z.T, preferred_element_type=jnp.float32)  # MXU
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (TILE_N, 1)
    z2 = jnp.sum(z * z, axis=-1, keepdims=True).T  # (1, M)
    d2 = jnp.maximum(x2 + z2 - 2.0 * xz, 0.0)
    out_ref[:] = os_ref[0, 0] * jnp.exp(-0.5 * d2)


def _rbf_pallas(xs: jnp.ndarray, zs: jnp.ndarray, outputscale) -> jnp.ndarray:
    """xs: (N, d) pre-scaled, zs: (M, d) pre-scaled -> (N, M)."""
    total_n, d = xs.shape
    m = zs.shape[0]
    dpad = max(128, ((d + 127) // 128) * 128)
    npad = ((total_n + _TILE_N - 1) // _TILE_N) * _TILE_N
    mpad = max(128, ((m + 127) // 128) * 128)

    xs = jnp.pad(xs.astype(jnp.float32), ((0, npad - total_n), (0, dpad - d)))
    zs = jnp.pad(zs.astype(jnp.float32), ((0, mpad - m), (0, dpad - d)))
    os_arr = jnp.asarray(outputscale, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        _rbf_body,
        out_shape=jax.ShapeDtypeStruct((npad, mpad), jnp.float32),
        grid=(npad // _TILE_N,),
        in_specs=[
            pl.BlockSpec((_TILE_N, dpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mpad, dpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_N, mpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * mpad * dpad,
            bytes_accessed=4 * (npad * dpad + mpad * dpad + npad * mpad),
            transcendentals=npad * mpad,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xs, zs, os_arr)
    return out[:total_n, :m]


@jax.custom_vjp
def rbf_cross_kernel(x, z, lengthscale, outputscale):
    """x: (..., N, d), z: (M, d) -> (..., N, M); numerically matches
    ``gp.kernels.rbf_ard``."""
    k, _ = _fwd(x, z, lengthscale, outputscale)
    return k


def _fwd(x, z, lengthscale, outputscale):
    *batch, n, d = x.shape
    xs = (x / lengthscale).reshape(-1, d)
    zs = z / lengthscale
    k_flat = _rbf_pallas(xs, zs, outputscale)
    k = k_flat.reshape(*batch, n, z.shape[0]).astype(x.dtype)
    return k, (x, z, lengthscale, outputscale, k)


def _bwd(res, g):
    x, z, lengthscale, outputscale, k = res
    *batch, n, d = x.shape
    m = z.shape[0]
    xs = (x / lengthscale).reshape(-1, d).astype(jnp.float32)
    zs = (z / lengthscale).astype(jnp.float32)
    gk = (g * k).reshape(-1, m).astype(jnp.float32)  # (N, M)

    row = jnp.sum(gk, axis=-1, keepdims=True)  # (N, 1)
    col = jnp.sum(gk, axis=0, keepdims=True).T  # (M, 1)
    gxs = gk @ zs - row * xs  # (N, d)
    gzs = gk.T @ xs - col * zs  # (M, d)

    gos = jnp.sum(g * k) / outputscale
    # chain: xs = x / l, zs = z / l
    gx = (gxs / lengthscale).reshape(x.shape).astype(x.dtype)
    gz = (gzs / lengthscale).astype(z.dtype)
    gl = -(
        jnp.sum(gxs * x.reshape(-1, d), axis=0)
        + jnp.sum(gzs * z, axis=0)
    ) / (lengthscale**2)
    return gx, gz, gl.astype(lengthscale.dtype), gos.astype(jnp.result_type(outputscale))


rbf_cross_kernel.defvjp(_fwd, _bwd)

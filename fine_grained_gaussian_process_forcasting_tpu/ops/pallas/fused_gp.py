"""Fused whitened-GP marginals: the variational blur's hot path as ONE
VMEM-resident Pallas kernel.

The XLA path of ``gp/deep_gp.py`` materializes two (B, N, M) tensors in
HBM per forward — the cross-covariance ``kzx`` and the whitened solve
``a = kzx @ L^-T`` (~100 MB each at the flagship's B=256, N=384, M=256)
— and reads them back for three reductions; the backward doubles that.
bench.py measured the segment HBM-bandwidth-bound at ~21 TFLOP/s fp32
(NOTES.md "MXU ceiling").

This kernel removes that traffic algebraically.  With

    W = L^-T diag(1 - s^2) L^-1        (M x M, precomputed per step)
    u = L^-T m                         (M,)

the whitened marginals (``deep_gp.py`` module docstring) collapse to

    mean_k[r] = sum_m K[r, m] u[m]
    var[r]    = outputscale - sum_m (K @ W)[r, m] * K[r, m]

Every input point sees the SAME inducing set, so the (B, N) points
flatten into one row axis tiled at ``_TR`` rows per grid cell — each cell
is a (TR x d)(d x M) + (TR x M)(M x M) GEMM pair with K and K@W living
only in VMEM; HBM sees x in and two (R,) vectors out.  Rows are zero-
padded to a tile multiple: padded rows produce garbage marginals that are
sliced off, and zero cotangents (the bwd pads dmean/dvar with zeros)
erase their parameter-gradient contributions exactly.

The backward recomputes K per tile (flash-attention-style
rematerialization) and accumulates the small parameter cotangents
(dzs, du, dW, dos) across the sequential TPU grid:

    dK  = dmean u^T - 2 dvar (K @ W)        (W symmetric)
    dxs = E @ zs - rowsum(E) * xs           (E = dK * K)
    dzs = E^T @ xs - colsum(E) * zs
    du  = K^T dmean
    dW  = - K^T diag(dvar) K
    dos = sum(E) / os + sum(dvar)

Replaces the gpytorch ``VariationalStrategy`` hot path the reference
reaches through ``denoising_model/DeepGP.py:51-54``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 2048  # rows (flattened batch x points) per grid cell; the round-3
# tile sweep (RESULTS.md "kernel ablation") measured larger tiles faster
# at both flagship (d=32 fp32: 68.0 vs 63.1 TFLOP/s at 2048 vs 1024) and
# lane-filling (d=128 bf16: 104.1 vs 93.8) shapes — fewer parameter-
# cotangent accumulation rounds and longer MXU pipelines per cell.
# 4096 is another ~4% faster standalone but its bwd needs 23.8 MiB of
# scoped VMEM and the compiler's in-step limit is 16 MiB (OOM inside the
# full train step); 2048 fits at flagship dims and _row_layout downshifts
# automatically where the bwd tile would not fit (e.g. 1024 at d=512)


def _dot16(a, b, bf16):
    """MXU dot with optional bf16 inputs (fp32 accumulation either way)."""
    if bf16:
        a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _fwd_kernel(bf16, affine, xs_ref, zs_ref, u_ref, w_ref, os_ref,
                *rest):
    if affine:
        # x arrives RAW; the lengthscale division and the LinearMean
        # (x @ mean_w + mean_b) run inside the kernel — the scaled copy
        # of x and the mean GEMV never touch HBM (measured 0.41 ms of
        # the 1.04 ms segment at flagship shapes, fwd+bwd)
        ils_ref, mw_ref, mb_ref, mean_ref, var_ref = rest
        xr = xs_ref[:]  # raw (TR, d)
        x = xr * ils_ref[:]  # scaled, VMEM-only
        mean_x = (jnp.sum(xr * mw_ref[:], axis=-1, keepdims=True)
                  + mb_ref[0, 0])  # (TR, 1)
    else:
        mean_ref, var_ref = rest
        x = xs_ref[:]  # (TR, d), pre-scaled by 1/lengthscale
        mean_x = 0.0
    os_ = os_ref[0, 0]
    z = zs_ref[:]  # (M, d)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (TR, 1)
    z2 = jnp.sum(z * z, axis=-1, keepdims=True)  # (M, 1)
    # the distance GEMM runs at Mosaic's default fp32 dot (multi-pass
    # bf16, ~2^-11 effective) — deliberately NOT precision=HIGHEST.
    # This is the same decomposition-inconsistency class as the
    # kernels.sq_dist TPU bug, but here nothing downstream factorizes:
    # the only cost is marginal accuracy (posterior-mean error 2.8e-4
    # vs 2.3e-6 with HIGHEST, measured), while HIGHEST cost a measured
    # +34% kernel time (0.49 -> 0.66 ms flagship fwd+grad) and dropped
    # the d128 bf16 kernel from 53% to 41% of peak — exp() keeps
    # k in [0, os] regardless, so the tradeoff is safe by construction.
    d2 = x2 + z2.T - 2.0 * jnp.dot(x, z.T, preferred_element_type=jnp.float32)
    k = os_ * jnp.exp(-0.5 * d2)  # (TR, M)
    g = _dot16(k, w_ref[:], bf16)  # (TR, M) — the dominant GEMM
    # (TR, 1) column stores: the row-reduction lands in sublanes, so no
    # sublane->lane transpose is emitted (the (1, TR) lane layout cost a
    # measured 2.3x on the whole fwd kernel — scripts/kernel_ablate_r3.py)
    mean_ref[0] = mean_x + jnp.sum(k * u_ref[:], axis=-1, keepdims=True)
    var_ref[0] = os_ - jnp.sum(g * k, axis=-1, keepdims=True)


def _bwd_kernel(bf16, affine, xs_ref, zs_ref, u_ref, w_ref, os_ref,
                *rest):
    if affine:
        (ils_ref, mw_ref, mb_ref, dmean_ref, dvar_ref, dxs_ref, dzs_ref,
         du_ref, dw_ref, dos_ref, dils_ref, dmw_ref, dmb_ref) = rest
        xr = xs_ref[:]
        x = xr * ils_ref[:]
    else:
        (dmean_ref, dvar_ref, dxs_ref, dzs_ref, du_ref, dw_ref,
         dos_ref) = rest
        x = xs_ref[:]
    os_ = os_ref[0, 0]
    z = zs_ref[:]
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    z2 = jnp.sum(z * z, axis=-1, keepdims=True)
    d2 = x2 + z2.T - 2.0 * jnp.dot(x, z.T, preferred_element_type=jnp.float32)
    k = os_ * jnp.exp(-0.5 * d2)  # recomputed, never in HBM
    g = _dot16(k, w_ref[:], bf16)

    dm = dmean_ref[0]  # (TR, 1) — column cotangents broadcast over lanes
    dv = dvar_ref[0]  # (TR, 1)   without a transpose
    dk = dm * u_ref[:] - 2.0 * dv * g  # (TR, M)
    e = dk * k

    dxsc = (jnp.dot(e, z, preferred_element_type=jnp.float32)
            - jnp.sum(e, axis=-1, keepdims=True) * x)  # wrt SCALED x
    if affine:
        # chain through xs = x_raw * inv_ls, plus the LinearMean's dm path
        dxs_ref[:] = dxsc * ils_ref[:] + dm * mw_ref[:]
        dils = jnp.sum(dxsc * xr, axis=0)[None, :]  # (1, d)
        dmw = jnp.sum(dm * xr, axis=0)[None, :]  # (1, d)
        dmb = jnp.sum(dm)
    else:
        dxs_ref[:] = dxsc

    # parameter cotangents accumulate across the (sequential) TPU grid
    dzs = (jax.lax.dot_general(e, x, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           - jnp.sum(e, axis=0)[:, None] * z)  # (M, d)
    du = jnp.sum(k * dm, axis=0)[None, :]  # (1, M)
    if bf16:
        k16, dvk16 = (k.astype(jnp.bfloat16),
                      (dv * k).astype(jnp.bfloat16))
        dw = -jax.lax.dot_general(k16, dvk16, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    else:
        dw = -jax.lax.dot_general(k, dv * k, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dos = jnp.sum(e) / os_ + jnp.sum(dv)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dzs_ref[:] = dzs
        du_ref[:] = du
        dw_ref[:] = dw
        dos_ref[0, 0] = dos
        if affine:
            dils_ref[:] = dils
            dmw_ref[:] = dmw
            dmb_ref[0, 0] = dmb

    @pl.when(pl.program_id(0) != 0)
    def _accum():
        dzs_ref[:] += dzs
        du_ref[:] += du
        dw_ref[:] += dw
        dos_ref[0, 0] += dos
        if affine:
            dils_ref[:] += dils
            dmw_ref[:] += dmw
            dmb_ref[0, 0] += dmb


def _row_layout(b, n, d=32, m=256, affine=False):
    """Rows padded to a whole number of row-tiles (single tile if small).

    The tile is the largest power of two <= _TR whose BWD kernel fits the
    compiler's 16 MiB scoped-VMEM limit *inside a full train step*.  The
    byte model is calibrated from two measured compiler OOM reports
    (23.81 MiB at tr=4096 d=32 m=256; 21.50 MiB at tr=2048 d=512 m=256):
    bytes/row ~= 21.5*m + 9.8*d, budgeted at 15 MB for margin.  The
    affine kernel keeps both the raw and scaled x tiles live (+4*d/row,
    budgeted +4 more for slack)."""
    r = b * n
    tr = min(_TR, r)
    dcoef = 18.0 if affine else 10.0
    while tr > 512 and tr * (22.0 * m + dcoef * d) > 15e6:
        tr //= 2
    rp = -(-r // tr) * tr
    return r, rp, tr


def _forward(xs, zs, u, w, outputscale, affine_args=None, bf16=False):
    b, n, d = xs.shape
    m = zs.shape[0]
    affine = affine_args is not None
    r, rp, tr = _row_layout(b, n, d, m, affine)
    xf = xs.reshape(r, d)
    if rp != r:
        xf = jnp.pad(xf, ((0, rp - r), (0, 0)))
    os2d = jnp.asarray(outputscale, jnp.float32).reshape(1, 1)
    const_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    operands = [xf, zs, u.reshape(1, m), w, os2d]
    extra_specs = []
    if affine:
        inv_ls, mean_w, mean_b = affine_args
        operands += [inv_ls.reshape(1, d), mean_w.reshape(1, d),
                     jnp.asarray(mean_b, jnp.float32).reshape(1, 1)]
        extra_specs = [const_spec, const_spec, smem_spec]
    mean, var = pl.pallas_call(
        functools.partial(_fwd_kernel, bf16, affine),
        grid=(rp // tr,),
        in_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            smem_spec,
            *extra_specs,
        ],
        # (G, tr, 1) COLUMN blocks: Mosaic's block rule ((8, 128)-divisible
        # or equal to the array dims) admits (tr, 1) as the trailing dims of
        # a 3-D layout, and the column orientation keeps the kernel's row
        # reductions in sublanes — no lane transpose per tile
        out_specs=[
            pl.BlockSpec((1, tr, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp // tr, tr, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp // tr, tr, 1), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return (mean.reshape(rp)[:r].reshape(b, n),
            var.reshape(rp)[:r].reshape(b, n))


def _bwd_rule(bf16, affine, residuals, cotangents):
    if affine:
        xs, zs, u, w, outputscale, inv_ls, mean_w, mean_b = residuals
    else:
        xs, zs, u, w, outputscale = residuals
    dmean, dvar = cotangents
    b, n, d = xs.shape
    m = zs.shape[0]
    r, rp, tr = _row_layout(b, n, d, m, affine)
    xf = xs.reshape(r, d)
    dmf = dmean.reshape(r)
    dvf = dvar.reshape(r)
    if rp != r:
        # zero cotangents on padded rows -> zero parameter contributions
        xf = jnp.pad(xf, ((0, rp - r), (0, 0)))
        dmf = jnp.pad(dmf, (0, rp - r))
        dvf = jnp.pad(dvf, (0, rp - r))
    os2d = jnp.asarray(outputscale, jnp.float32).reshape(1, 1)
    const_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    operands = [xf, zs, u.reshape(1, m), w, os2d]
    extra_in_specs = []
    extra_out_specs = []
    extra_out_shapes = []
    if affine:
        operands += [inv_ls.reshape(1, d), mean_w.reshape(1, d),
                     jnp.asarray(mean_b, jnp.float32).reshape(1, 1)]
        extra_in_specs = [const_spec, const_spec, smem_spec]
        extra_out_specs = [const_spec, const_spec, smem_spec]
        extra_out_shapes = [
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ]
    operands += [dmf.reshape(rp // tr, tr, 1), dvf.reshape(rp // tr, tr, 1)]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, bf16, affine),
        grid=(rp // tr,),
        in_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            smem_spec,
            *extra_in_specs,
            pl.BlockSpec((1, tr, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            smem_spec,
            *extra_out_specs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, d), jnp.float32),
            jax.ShapeDtypeStruct((m, d), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            *extra_out_shapes,
        ],
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    if affine:
        dxs, dzs, du, dw, dos, dils, dmw, dmb = outs
        return (dxs[:r].reshape(b, n, d), dzs, du.reshape(m), dw,
                dos.reshape(()).astype(jnp.asarray(outputscale).dtype),
                dils.reshape(inv_ls.shape), dmw.reshape(mean_w.shape),
                dmb.reshape(()).astype(jnp.asarray(mean_b).dtype))
    dxs, dzs, du, dw, dos = outs
    return (dxs[:r].reshape(b, n, d), dzs, du.reshape(m), dw,
            dos.reshape(()).astype(jnp.asarray(outputscale).dtype))


def _make_op(bf16):
    @jax.custom_vjp
    def op(xs, zs, u, w, outputscale):
        return _forward(xs, zs, u, w, outputscale, None, bf16)

    def fwd_rule(xs, zs, u, w, outputscale):
        return (_forward(xs, zs, u, w, outputscale, None, bf16),
                (xs, zs, u, w, outputscale))

    op.defvjp(fwd_rule, functools.partial(_bwd_rule, bf16, False))
    return op


def _make_affine_op(bf16):
    @jax.custom_vjp
    def op(x, zs, u, w, outputscale, inv_ls, mean_w, mean_b):
        return _forward(x, zs, u, w, outputscale,
                        (inv_ls, mean_w, mean_b), bf16)

    def fwd_rule(x, zs, u, w, outputscale, inv_ls, mean_w, mean_b):
        return (_forward(x, zs, u, w, outputscale,
                         (inv_ls, mean_w, mean_b), bf16),
                (x, zs, u, w, outputscale, inv_ls, mean_w, mean_b))

    op.defvjp(fwd_rule, functools.partial(_bwd_rule, bf16, True))
    return op


#: fp32 everywhere (bit-comparable with the XLA path, tests/test_fused_gp.py)
whitened_marginals = _make_op(False)
#: the two dominant (TR, M)(M, M) GEMMs in bf16 inputs / fp32 accumulation
#: (the distance GEMM and all elementwise math stay fp32) — use via
#: ``gp_compute_dtype=bfloat16``
whitened_marginals_bf16 = _make_op(True)
#: affine variants: x arrives RAW; xs = x * inv_ls and the LinearMean
#: (x @ mean_w + mean_b) run inside the kernel, so the scaled copy of x
#: and the mean GEMV never hit HBM (0.41 ms of the 1.04 ms flagship
#: segment, fwd+bwd — RESULTS.md round 3)
whitened_marginals_affine = _make_affine_op(False)
whitened_marginals_affine_bf16 = _make_affine_op(True)

whitened_marginals.__doc__ = """(mean_k, var) of the whitened variational
GP at pre-scaled inputs.

xs: (B, N, d) = x / lengthscale;  zs: (M, d) = Z / lengthscale;
u: (M,) = L^-T m;  w: (M, M) = L^-T diag(1-s^2) L^-1;
outputscale: scalar.  Returns ((B, N), (B, N)).
"""

whitened_marginals_affine.__doc__ = """(mean, var) of the whitened
variational GP at RAW inputs, with the input scaling and LinearMean
folded into the kernel.

x: (B, N, d) raw;  zs: (M, d) = Z / lengthscale;  u: (M,) = L^-T m;
w: (M, M) = L^-T diag(1-s^2) L^-1;  outputscale: scalar;
inv_ls: (d,) = 1 / lengthscale;  mean_w: (d,);  mean_b: scalar.
Returns ((B, N), (B, N)) with mean = x @ mean_w + mean_b + K u.
"""

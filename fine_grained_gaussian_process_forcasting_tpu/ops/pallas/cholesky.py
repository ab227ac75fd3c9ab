"""Batched blocked Cholesky Pallas kernel.

Exploration of SURVEY.md s7 "hard parts (a)" (batched Cholesky with MXU
occupancy).  Measured on v5e for (256, 192, 192) fp32: XLA 10.9 ms,
``unblocked`` kernel 22.7 ms (O(n^3) masked VPU column recurrence),
``blocked`` 34.8 ms (128-wide panels via dynamic ref slices; the masked
diagonal-tile recurrence dominates and lane-aligned panels force BS=128).
Conclusion: XLA's batched factorization wins at these sizes, so the
framework defaults to it (``gp/exact_blur.py: use_pallas=False``); these
kernels remain as tested infrastructure for larger-matrix regimes.

Variants:
- ``blocked``: right-looking fori_loop over 128-wide panels — diagonal
  tiles factored by a masked unblocked recurrence on the VPU, panel solve
  and trailing (syrk) update as fixed-shape MXU matmuls.
- ``unblocked`` (default): one masked column recurrence over the matrix.

The backward pass uses the standard Cholesky pullback
    dA = 0.5 * L^{-T} (P + P^T) L^{-1},  P = phi(L^T dL)
(phi = lower triangle with halved diagonal), evaluated with plain XLA
triangular solves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BS = 128  # panel width (lane-dim dynamic slices must start at multiples
# of 128 on TPU, so the panel width matches the lane tile)


def _tile_iotas():
    rt = jax.lax.broadcasted_iota(jnp.int32, (_BS, _BS), 0)
    ct = jax.lax.broadcasted_iota(jnp.int32, (_BS, _BS), 1)
    trows = jax.lax.broadcasted_iota(jnp.int32, (_BS, 1), 0)[:, 0]
    return rt, ct, trows


def _tile_chol(tile: jnp.ndarray) -> jnp.ndarray:
    """Unblocked Cholesky of a (BS, BS) SPD tile via masked column steps."""
    rt, ct, trows = _tile_iotas()

    def body(j, t):
        djj = jnp.sum(jnp.where((rt == j) & (ct == j), t, 0.0))
        d = jnp.sqrt(djj)
        colj = jnp.sum(jnp.where(ct == j, t, 0.0), axis=1)
        lcol = jnp.where(trows == j, d, jnp.where(trows > j, colj / d, 0.0))
        u = jnp.where(trows > j, lcol, 0.0)
        t = t - u[:, None] * u[None, :]
        t = jnp.where(ct == j, lcol[:, None], t)
        return t

    out = jax.lax.fori_loop(0, _BS, body, tile)
    rt, ct, _ = _tile_iotas()
    return jnp.where(rt >= ct, out, 0.0)


def _tile_inv(L: jnp.ndarray) -> jnp.ndarray:
    """Forward-substitution inverse of a (BS, BS) lower-triangular tile."""
    rt, ct, trows = _tile_iotas()
    x0 = jnp.where(rt == ct, 1.0, 0.0)

    def body(j, x):
        ljj = jnp.sum(jnp.where((rt == j) & (ct == j), L, 0.0))
        rowj = jnp.sum(jnp.where(rt == j, x, 0.0), axis=0) / ljj
        colLj = jnp.sum(jnp.where(ct == j, L, 0.0), axis=1)
        u = jnp.where(trows > j, colLj, 0.0)
        x = x - u[:, None] * rowj[None, :]
        x = jnp.where(rt == j, rowj[None, :], x)
        return x

    return jax.lax.fori_loop(0, _BS, body, x0)


def _make_kernel(npad: int, blocked: bool):
    nb = npad // _BS

    def kernel_blocked(a_ref, out_ref):
        out_ref[0] = a_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (npad, 1), 0)[:, 0]

        def panel_step(kb, _):
            lo = pl.multiple_of(kb * _BS, _BS)
            tile = out_ref[0, pl.ds(lo, _BS), pl.ds(lo, _BS)]
            ld = _tile_chol(tile)
            out_ref[0, pl.ds(lo, _BS), pl.ds(lo, _BS)] = ld
            inv = _tile_inv(ld)
            # full-height column panel; rows above the trailing block are
            # restored from the current contents after the solve
            panel = out_ref[0, :, pl.ds(lo, _BS)]
            p_full = jnp.dot(panel, inv.T, preferred_element_type=jnp.float32)
            below = (rows >= lo + _BS)[:, None]
            p = jnp.where(below, p_full, 0.0)
            out_ref[0, :, pl.ds(lo, _BS)] = jnp.where(below, p, panel)
            # trailing syrk: p is zero outside the trailing rows, so the
            # full-matrix subtraction only touches the trailing block
            a = out_ref[0]
            out_ref[0] = a - jnp.dot(p, p.T,
                                     preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nb, panel_step, 0)
        r = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
        out_ref[0] = jnp.where(r >= c, out_ref[0], 0.0)

    def kernel_unblocked(a_ref, out_ref):
        r = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (npad, 1), 0)[:, 0]

        def body(j, a):
            djj = jnp.sum(jnp.where((r == j) & (c == j), a, 0.0))
            d = jnp.sqrt(djj)
            colj = jnp.sum(jnp.where(c == j, a, 0.0), axis=1)
            lcol = jnp.where(rows == j, d,
                             jnp.where(rows > j, colj / d, 0.0))
            u = jnp.where(rows > j, lcol, 0.0)
            a = a - u[:, None] * u[None, :]
            a = jnp.where(c == j, lcol[:, None], a)
            return a

        a = jax.lax.fori_loop(0, npad, body, a_ref[0])
        out_ref[0] = jnp.where(r >= c, a, 0.0)

    return kernel_blocked if blocked else kernel_unblocked


def _cholesky_impl(a: jnp.ndarray, blocked: bool = False) -> jnp.ndarray:
    *batch, n, _ = a.shape
    b = 1
    for s in batch:
        b *= s
    a2 = a.reshape(b, n, n).astype(jnp.float32)

    npad = ((n + _BS - 1) // _BS) * _BS
    if npad != n:
        # embed in identity: chol of blockdiag(A, I) = blockdiag(L, I)
        pad = jnp.broadcast_to(jnp.eye(npad, dtype=jnp.float32),
                               (b, npad, npad))
        a2 = pad.at[:, :n, :n].set(a2)

    out = pl.pallas_call(
        _make_kernel(npad, blocked),
        out_shape=jax.ShapeDtypeStruct((b, npad, npad), jnp.float32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=b * npad**3 // 3,
            bytes_accessed=2 * 4 * b * npad * npad,
            transcendentals=b * npad,
        ),
        interpret=jax.default_backend() == "cpu",
    )(a2)

    out = out[:, :n, :n]
    return out.reshape(*batch, n, n).astype(a.dtype)


@jax.custom_vjp
def batched_cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of (..., N, N) SPD matrices."""
    return _cholesky_impl(a)


def _fwd(a):
    l = _cholesky_impl(a)
    return l, l


def _bwd(l, dl):
    # standard Cholesky pullback via triangular solves
    def phi(x):
        return jnp.tril(x) - 0.5 * jnp.diagonal(
            x, axis1=-2, axis2=-1)[..., None] * jnp.eye(x.shape[-1])

    p = phi(jnp.einsum("...ji,...jk->...ik", l, dl))
    s = p + jnp.swapaxes(p, -1, -2)
    # da = 0.5 * L^{-T} s L^{-1}
    tmp = jax.scipy.linalg.solve_triangular(l, s, lower=True, trans=1)
    da = 0.5 * jnp.swapaxes(
        jax.scipy.linalg.solve_triangular(
            l, jnp.swapaxes(tmp, -1, -2), lower=True, trans=1),
        -1, -2)
    return (da,)


batched_cholesky.defvjp(_fwd, _bwd)

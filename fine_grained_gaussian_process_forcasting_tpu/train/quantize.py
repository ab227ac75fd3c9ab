"""Post-training int8 quantization for serving (TPU-native addition).

The reference has no quantized inference; on TPU the MXU executes int8
GEMMs with int32 accumulation, and int8 weights are 4x smaller than
fp32 — the deployment-footprint win (the throughput result on v5e
through current XLA is an honest negative: RESULTS.md "int8 serving
path").

Scheme (standard weight-per-channel / activation-per-token dynamic PTQ):

    w_s = max|w[:, j]| / 127        per OUTPUT channel  (pre-computed
    w_q = round(w / w_s)  : int8     ONCE per session — build_qparams)
    x_s = max|x[token]| / 127       per token, dynamic
    x_q = round(x / x_s)  : int8
    y   = (x_q @ w_q) : int32  *  x_s * w_s  (+ bias, fp32)

Only ``nn.Dense`` layers are touched — embeddings, Q/K/V/out projections,
FFN, final head.  LayerNorm, softmax/correlation math, the GP stack and
all reductions stay in their original dtypes, which keeps the accuracy
loss to the GEMM rounding alone.  Implementation is a flax method
interceptor (``nn.intercept_methods``), so NO model code changes and any
checkpoint serves quantized as-is:

    with quantized_apply("int8", lambda: qmap):
        out = model.apply(variables, enc, dec, training=False, ...)

or simply ``InferenceSession(..., quantize="int8")``, which pre-quantizes
the weights once (``build_qparams``) so the serving executable reads the
int8 copies and the unused fp32 Dense kernels are dead-code-eliminated
from it.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _quantize_weight(w: jnp.ndarray):
    """(in, out) fp weight -> (int8 weight, per-out-channel fp32 scale)."""
    wf = w.astype(jnp.float32)
    ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
    wq = jnp.round(wf / ws).astype(jnp.int8)
    return wq, ws


def _int8_apply(x, wq, ws, bias):
    """Activation-quantized int8 GEMM + dequant.  x: (..., in)."""
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * ws
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def int8_dense(x: jnp.ndarray, kernel: jnp.ndarray, bias=None) -> jnp.ndarray:
    """Dense forward with int8 MXU GEMM (weights quantized inline —
    the one-off path; sessions pre-quantize via :func:`build_qparams`)."""
    wq, ws = _quantize_weight(kernel)
    return _int8_apply(x, wq, ws, bias)


def build_qparams(params) -> dict:
    """Pre-quantize every Dense kernel in a params tree, ONCE.

    Returns ``{(module, path, tuple): (int8 kernel, fp32 scales)}``.
    A 2-D ``kernel`` leaf identifies ``nn.Dense`` in this codebase
    (flax convs use 3-D kernels, embeds use ``embedding``).  The whole
    map is built in one jitted dispatch — eager per-leaf ops cost ~100 ms
    each over a remote-TPU tunnel (NOTES.md).
    """
    paths = []

    def collect(node, path):
        if isinstance(node, dict):
            k = node.get("kernel")
            if k is not None and getattr(k, "ndim", 0) == 2:
                paths.append(path)
            for name, child in node.items():
                collect(child, path + (name,))

    collect(params, ())

    @jax.jit
    def _build(params):
        out = {}
        for path in paths:
            node = params
            for name in path:
                node = node[name]
            out[path] = _quantize_weight(node["kernel"])
        return out

    return _build(params)


def _make_interceptor(qmap_getter: Optional[Callable[[], dict]]):
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (type(mod) is not nn.Dense or context.method_name != "__call__"
                or not mod.has_variable("params", "kernel")):
            return next_fun(*args, **kwargs)
        bias = (mod.get_variable("params", "bias")
                if mod.has_variable("params", "bias") else None)
        (x,) = args
        q = qmap_getter().get(tuple(mod.path)) if qmap_getter else None
        if q is not None:
            y = _int8_apply(x, q[0], q[1], bias)
        else:
            y = int8_dense(x, mod.get_variable("params", "kernel"), bias)
        # honor the Dense's configured output dtype; dtype=None follows
        # flax promotion semantics (bf16 x against an fp32 kernel
        # promotes to fp32 — casting to x.dtype would silently narrow)
        kdtype = (q[1].dtype if q is not None
                  else mod.get_variable("params", "kernel").dtype)
        out_dtype = mod.dtype or jnp.promote_types(x.dtype, kdtype)
        return y.astype(out_dtype)
    return interceptor


# the inline (no pre-quantized map) interceptor, for one-off use
int8_dense_interceptor = _make_interceptor(None)


@contextlib.contextmanager
def quantized_apply(quantize: Optional[str],
                    qmap_getter: Optional[Callable[[], dict]] = None):
    """Context manager wrapping ``model.apply`` in the quantized-serving
    interceptor.  ``quantize=None`` is a no-op; ``'int8'`` intercepts
    every Dense (with pre-quantized weights when ``qmap_getter`` is
    given — a zero-arg callable so jit-traced maps can be injected at
    trace time).  Shared by ``train.predict.InferenceSession`` and
    ``scripts/bench_inference.py`` so the bench measures exactly the
    serving path."""
    if quantize is None:
        yield
        return
    if quantize != "int8":
        raise ValueError(f"quantize={quantize!r} (None or 'int8')")
    with nn.intercept_methods(_make_interceptor(qmap_getter)):
        yield

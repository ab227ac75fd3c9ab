"""Scaled dot-product attention — the ``basic`` op of the zoo.

Re-design of the reference's ``forecasting_models/BasicAttn.py:7-25``
(einsum -> softmax -> einsum) as a pure jittable function.  On TPU, XLA
fuses the softmax into the surrounding batched matmuls; a Pallas
flash-style kernel is available in ``ops.pallas.flash_attention`` for the
long-sequence regime.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def scaled_dot_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """Softmax attention over (batch, heads, length, d_k) operands.

    Returns ``(context, attn)`` like the reference
    (``forecasting_models/BasicAttn.py:20-25``).  No masking — the
    reference's decoder is intentionally unmasked.
    """
    d_k = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(d_k)
    attn = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum(
        "bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    return context, attn

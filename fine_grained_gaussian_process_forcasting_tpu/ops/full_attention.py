"""Full (optionally causal-masked) attention for the FEDformer stack.

Re-design of ``layers/SelfAttention_Family.py:14-41`` — whose import of
``utils.masking`` has no target in the reference repo (a latent
ImportError); the triangular causal mask is implemented here directly.
Interface matches the stack's inner-correlation ops: (B, L, H, E) in/out.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def full_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask_flag: bool = False,
    scale: Optional[float] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """q/k/v: (B, L, H, E); returns ((B, L, H, E), attn)."""
    B, L, H, E = q.shape
    S = k.shape[1]
    scale = scale or 1.0 / math.sqrt(E)
    scores = jnp.einsum(
        "blhe,bshe->bhls", q, k, preferred_element_type=jnp.float32)
    if mask_flag:
        causal = jnp.tril(jnp.ones((L, S), dtype=bool))
        scores = jnp.where(causal[None, None], scores, -jnp.inf)
    attn = jax.nn.softmax(scale * scores, axis=-1)
    out = jnp.einsum(
        "bhls,bshe->blhe", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    return out, attn

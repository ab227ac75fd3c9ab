"""ProbSparse attention (Informer).

Re-design of ``forecasting_models/Informer.py:7-93``: sample
``ceil(ln(L_k))`` keys per query, rank queries by the sparsity measure
``M = max - mean``, let the top ``ceil(ln(L_q))`` queries attend fully and
give the rest the mean-of-values context.  Sample counts are Python ints at
trace time, so shapes stay static; the context update is a functional
scatter (``.at[].set``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def prob_sparse_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rng: jax.Array,
    factor: int = 1,
    scale: Optional[float] = None,
    mask_flag: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """ProbSparse attention over (b, h, l, d) operands.

    ``mask_flag=False`` matches the dispatcher's
    ``ProbAttention(mask_flag=False)`` usage
    (``modules/multi_head_attention.py:85``): non-top queries receive the
    mean-of-values context.

    ``mask_flag=True`` is the causal variant
    (``layers/SelfAttention_Family.py:44-131``): requires ``L_Q == L_K``
    (self-attention only), the initial context is the *cumulative sum* of V
    (the causal running context), and each selected query's scores are
    masked beyond its own position (the ``ProbMask`` the reference imports
    from the missing ``utils.masking`` module — a latent ImportError there,
    implemented directly here)."""
    B, H, L_Q, D = q.shape
    L_K = k.shape[2]

    u_part = min(int(factor * math.ceil(math.log(L_K))), L_K)
    u = min(int(factor * math.ceil(math.log(L_Q))), L_Q)

    # Sampled scores for the sparsity measure (``Informer.py:21-36``).
    # TPU re-design: every gather/scatter in this op is reformulated as a
    # one-hot matmul — row gathers along the sublane dim serialize on TPU,
    # while the equivalent (selected x L_K) one-hot GEMM rides the MXU.
    index_sample = jax.random.randint(rng, (L_Q, u_part), 0, L_K)
    onehot_sample = jax.nn.one_hot(index_sample.reshape(-1), L_K,
                                   dtype=k.dtype)  # (L_Q*u_part, L_K)
    k_sample = jnp.einsum(
        "sk,bhkd->bhsd", onehot_sample, k,
        preferred_element_type=jnp.float32,
    ).reshape(B, H, L_Q, u_part, D)
    qk_sample = jnp.einsum(
        "bhqd,bhqkd->bhqk", q, k_sample.astype(q.dtype),
        preferred_element_type=jnp.float32
    )
    m = jnp.max(qk_sample, axis=-1) - jnp.sum(qk_sample, axis=-1) / L_K
    _, m_top = jax.lax.top_k(m, u)  # (B, H, u)

    onehot_top = jax.nn.one_hot(m_top, L_Q, dtype=q.dtype)  # (B, H, u, L_Q)
    q_reduce = jnp.einsum(
        "bhul,bhld->bhud", onehot_top, q, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    scores = jnp.einsum(
        "bhud,bhkd->bhuk", q_reduce, k, preferred_element_type=jnp.float32
    )
    scores = scores * (scale or 1.0 / math.sqrt(D))

    if mask_flag:
        if L_Q != L_K:
            raise ValueError(
                "masked ProbSparse attention requires L_Q == L_K "
                f"(self-attention only), got {L_Q} != {L_K}"
            )
        # causal running context (``SelfAttention_Family.py:84-86``)
        context = jnp.cumsum(v, axis=-2).astype(v.dtype)
        # ProbMask: for each selected query row, mask keys beyond its own
        # original position
        causal = jnp.arange(L_K)[None, None, None, :] > m_top[..., None]
        scores = jnp.where(causal, -jnp.inf, scores)
    else:
        # mean-of-values context for every query (``Informer.py:47-56``)
        v_mean = jnp.mean(v, axis=-2, keepdims=True)  # (B, H, 1, D)
        context = jnp.broadcast_to(v_mean, (B, H, L_Q, D)).astype(v.dtype)

    attn = jax.nn.softmax(scores, axis=-1)
    top_ctx = jnp.einsum(
        "bhuk,bhkd->bhud", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)

    # Scatter-as-matmul: rows in m_top take top_ctx, the rest keep the
    # initial context.  (top_k indices are distinct, so the one-hot row
    # sums are exactly the selected-row indicator.)
    selected = jnp.einsum("bhul->bhl", onehot_top)  # (B, H, L_Q) in {0,1}
    scattered = jnp.einsum(
        "bhul,bhud->bhld", onehot_top, top_ctx,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    context = context * (1.0 - selected[..., None]) + scattered
    return context, None

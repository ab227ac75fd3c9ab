"""Parameter partition rules for tensor parallelism.

Pattern-based PartitionSpec assignment over the param pytree.  The
reference has no model parallelism; this is the capability-preserving
addition (SURVEY.md section 2.6): attention Q/K/V projections and the FFN
up-projection shard their *output* features over 'model', the attention
output projection and FFN down-projection shard their *input* features, so
each pair forms a megatron-style column/row split whose only collective is
the psum XLA inserts after the row-parallel matmul.
"""

from __future__ import annotations

import math
import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over 'path/to/param', spec) — first match wins.
_RULES = [
    # attention input projections: (d_model, h*d_k) -> split heads
    # (wqkv: the fused self-attention projection; GSPMD reshards the
    # q/k/v block split as needed, semantics unchanged)
    (r".*(wq|wk|wv|wqkv)/kernel$", P(None, "model")),
    # attention output projection: (h*d_v, d_model) -> row-parallel
    (r".*/fc/kernel$", P("model", None)),
    # FFN up / down
    (r".*ffn/w1/kernel$", P(None, "model")),
    (r".*ffn/w1/bias$", P("model")),
    (r".*ffn/w2/kernel$", P("model", None)),
    # GP inducing points replicated (small, used by every shard)
]


def param_specs(params) -> Any:
    """PartitionSpec pytree matching ``params`` via the rule table."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path) -> P:
        name = "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))) for k in path
        )
        for pattern, spec in _RULES:
            if re.match(pattern, name):
                return spec
        return P()

    specs = {tuple(p): spec_for(p) for p, _ in flat}
    treedef = jax.tree_util.tree_structure(params)
    leaves = [specs[tuple(p)] for p, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def fsdp_specs(params, n_data: int, base: Any = None,
               n_model: int = 1) -> Any:
    """ZeRO-3 / FSDP partition specs: shard parameter *storage* over 'data'.

    Starting from the tensor-parallel rules (``base``, default
    ``param_specs``), every leaf shards its largest still-replicated
    'data'-divisible dim over the data axis.  A 'model'-sharded dim only
    counts as sharded when the model axis is actually wider than 1
    (``n_model``): with --tp 1 the megatron rules are replication, so the
    attention/FFN kernels — the bulk of the bytes — FSDP-shard like any
    other leaf.  With tp > 1 the *other* dim of a tp-sharded kernel
    shards over 'data' (the standard 2-D megatron x ZeRO layout).

    Under jit/GSPMD that is the whole of FSDP: XLA all-gathers a param at
    its use site and reduce-scatters its gradient, so per-device
    param+optimizer memory drops by ~n_data while the math is unchanged
    (pinned by tests/test_parallel.py).  The reference has no distributed
    training at all (SURVEY.md section 2.6).

    Leaves smaller than ``2 * n_data`` elements (biases, GP scalars) stay
    replicated — gathering them costs more than the bytes saved.
    """
    if base is None:
        base = param_specs(params)
    if n_data <= 1:
        return base  # sharding over a size-1 axis is replication

    def canon(axes):
        # drop trailing Nones so replicated leaves stay P(), the same
        # canonical form param_specs emits
        while axes and axes[-1] is None:
            axes = axes[:-1]
        return P(*axes)

    def assign(leaf, spec):
        shape = getattr(leaf, "shape", ())
        axes = list(tuple(spec)) + [None] * (len(shape) - len(tuple(spec)))
        # a 'model' assignment on a 1-wide mesh axis is replication;
        # strip it up front so EVERY branch below (small-leaf and
        # no-candidate early exits included) returns the same canonical
        # convention — spec-equality asserts downstream
        # (__graft_entry__.py) must not depend on which exit fires
        # (advisor r3)
        if n_model <= 1:
            axes = [None if a == "model" else a for a in axes]
        if math.prod(shape) < 2 * n_data:
            return canon(axes)
        cands = [i for i, s in enumerate(shape)
                 if axes[i] is None and s % n_data == 0 and s > 0]
        if not cands:
            return canon(axes)
        axes[max(cands, key=lambda i: shape[i])] = "data"
        return canon(axes)

    return jax.tree_util.tree_map(assign, params, base)


def param_shardings(mesh: Mesh, params, fsdp: bool = False) -> Any:
    specs = param_specs(params)
    if fsdp:
        shape = dict(mesh.shape)
        specs = fsdp_specs(params, shape.get("data", 1), base=specs,
                           n_model=shape.get("model", 1))
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def opt_state_shardings(mesh: Mesh, opt_state: Any, params: Any,
                        fsdp: bool = False) -> Any:
    """Shardings for an optax state, co-located with the params.

    Any subtree structurally identical to ``params`` (adam's mu/nu moment
    trees) gets the param shardings so optimizer updates never reshard;
    every other leaf (step counts, empty states) is replicated.  With
    ``fsdp`` the moments shard with the FSDP param layout — the ZeRO
    optimizer-state partition.
    """
    p_treedef = jax.tree_util.tree_structure(params)
    p_shards = param_shardings(mesh, params, fsdp=fsdp)
    rep = NamedSharding(mesh, P())

    def walk(node):
        if jax.tree_util.tree_structure(node) == p_treedef:
            return p_shards
        if hasattr(node, "_fields"):  # optax NamedTuple states
            return type(node)(*(walk(getattr(node, f)) for f in node._fields))
        if isinstance(node, (tuple, list)):
            return type(node)(walk(c) for c in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return rep
    return walk(opt_state)

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


def param_shardings(mesh: Mesh, params) -> Any:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def opt_state_shardings(mesh: Mesh, opt_state: Any, params: Any) -> Any:
    """Shardings for an optax state, co-located with the params.

    Any subtree structurally identical to ``params`` (adam's mu/nu moment
    trees) gets the param shardings so optimizer updates never reshard;
    every other leaf (step counts, empty states) is replicated.
    """
    p_treedef = jax.tree_util.tree_structure(params)
    p_shards = param_shardings(mesh, params)
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

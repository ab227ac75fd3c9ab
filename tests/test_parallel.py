"""Parallelism validation: dp x tp sharded execution matches single-device.

The multi-chip capability's correctness contract: the same params + batch
must produce the same loss and gradients whether run replicated on one
device or sharded over the (data, model) mesh — XLA's collectives must be
semantics-preserving (SURVEY.md s2.6).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fine_grained_gaussian_process_forcasting_tpu.models import (
    ForecastDenoising,
)
from fine_grained_gaussian_process_forcasting_tpu.parallel import (
    make_mesh,
    param_shardings,
    param_specs,
)


def _setup():
    model = ForecastDenoising(
        src_input_size=4, tgt_input_size=4, d_model=16, n_heads=4, d_k=4,
        stack_size=1, pred_len=8, attn_type="basic", gp=True, denoise=True,
        num_inducing=8,
    )
    rng = jax.random.PRNGKey(0)
    enc = jax.random.normal(rng, (16, 24, 4))
    dec = jax.random.normal(rng, (16, 8, 4))
    y = jax.random.normal(rng, (16, 8, 1))
    variables = model.init(
        {"params": rng, "noise": rng, "sampling": rng}, enc, dec, y,
        training=True)
    return model, variables["params"], enc, dec, y


def _loss_fn(model):
    def loss(params, enc, dec, y):
        out = model.apply(
            {"params": params}, enc, dec, y, training=True,
            rngs={"noise": jax.random.PRNGKey(1),
                  "sampling": jax.random.PRNGKey(2)})
        return out.loss

    return loss


def test_sharded_loss_matches_single_device():
    model, params, enc, dec, y = _setup()
    loss = jax.jit(_loss_fn(model))
    ref = float(loss(params, enc, dec, y))

    mesh = make_mesh(n_data=4, n_model=2)
    p_shard = param_shardings(mesh, params)
    params_s = jax.device_put(params, p_shard)
    batch_shard = NamedSharding(mesh, P("data"))
    enc_s, dec_s, y_s = (jax.device_put(a, batch_shard)
                         for a in (enc, dec, y))
    with mesh:
        got = float(loss(params_s, enc_s, dec_s, y_s))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_sharded_gradients_match():
    model, params, enc, dec, y = _setup()
    grad = jax.jit(jax.grad(_loss_fn(model)))
    g_ref = grad(params, enc, dec, y)

    mesh = make_mesh(n_data=4, n_model=2)
    params_s = jax.device_put(params, param_shardings(mesh, params))
    batch_shard = NamedSharding(mesh, P("data"))
    enc_s, dec_s, y_s = (jax.device_put(a, batch_shard)
                         for a in (enc, dec, y))
    with mesh:
        g_sharded = grad(params_s, enc_s, dec_s, y_s)

    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_got = jax.tree_util.tree_leaves(jax.device_get(g_sharded))
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_cli_dp_tp_mesh_end_to_end(tmp_path):
    """--dp/--tp trains through the production CLI on a 4x2 virtual mesh:
    params tp-sharded, batch dp-sharded, finite metrics out."""
    import numpy as np

    from fine_grained_gaussian_process_forcasting_tpu.train import cli

    results = cli.main([
        "--exp_name", "solar", "--synthetic", "--attn_type", "basic",
        "--model_name", "mesh_smoke", "--num_epochs", "1", "--n_trials", "1",
        "--n_seeds", "1", "--pred_len", "8",
        "--out_dir", str(tmp_path), "--num_inducing", "8",
        "--max_train_samples", "64", "--max_valid_samples", "64",
        "--dp", "4", "--tp", "2",
    ])
    assert len(results) == 1
    assert np.isfinite(results[0]["mse"])


def test_opt_state_shardings_follow_params():
    import optax

    from fine_grained_gaussian_process_forcasting_tpu.parallel.sharding import (
        opt_state_shardings,
    )

    model, params, *_ = _setup()
    mesh = make_mesh(n_data=4, n_model=2)
    opt_state = optax.adam(1e-3).init(params)
    shards = opt_state_shardings(mesh, opt_state, params)
    p_shards = param_shardings(mesh, params)
    # adam's mu/nu mirror the param shardings exactly
    assert jax.tree_util.tree_leaves(shards[0].mu) == \
        jax.tree_util.tree_leaves(p_shards)
    assert jax.tree_util.tree_leaves(shards[0].nu) == \
        jax.tree_util.tree_leaves(p_shards)
    # the step count is replicated
    assert shards[0].count.spec == P()


def test_param_specs_shard_attention_and_ffn():
    model, params, *_ = _setup()
    specs = param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    sharded_names = []
    for path, spec in flat:
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        if spec != P():
            sharded_names.append(name)
    assert any("wq/kernel" in n for n in sharded_names)
    assert any("ffn/w1/kernel" in n for n in sharded_names)
    assert any("fc/kernel" in n for n in sharded_names)
    # GP params stay replicated
    assert not any("deep_gp" in n for n in sharded_names)


# --------------------------------------------------------------------- #
# FSDP (ZeRO-3 param/opt-state sharding over 'data')

def test_fsdp_loss_and_grads_match_single_device():
    """FSDP-sharded params: identical loss + grads to replicated single-
    device execution (all-gather at use / reduce-scatter of grads are
    semantics-preserving)."""
    model, params, enc, dec, y = _setup()
    loss = jax.jit(_loss_fn(model))
    grad = jax.jit(jax.grad(_loss_fn(model)))
    ref_l = float(loss(params, enc, dec, y))
    g_ref = grad(params, enc, dec, y)

    mesh = make_mesh(n_data=4, n_model=2)
    params_s = jax.device_put(
        params, param_shardings(mesh, params, fsdp=True))
    batch_shard = NamedSharding(mesh, P("data"))
    enc_s, dec_s, y_s = (jax.device_put(a, batch_shard)
                         for a in (enc, dec, y))
    with mesh:
        got_l = float(loss(params_s, enc_s, dec_s, y_s))
        g_got = grad(params_s, enc_s, dec_s, y_s)
    np.testing.assert_allclose(got_l, ref_l, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(jax.device_get(g_got))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_fsdp_specs_shard_replicated_leaves_over_data():
    from fine_grained_gaussian_process_forcasting_tpu.parallel.sharding import (
        fsdp_specs,
    )

    model, params, *_ = _setup()
    specs = fsdp_specs(params, n_data=4, n_model=2)
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda x: isinstance(x, P))[0]
    by_name = {
        "/".join(getattr(k, "key", str(k)) for k in path): spec
        for path, spec in flat
    }
    leaves = {
        "/".join(getattr(k, "key", str(k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    # tensor-parallel rules still win where they apply
    assert any("data" not in tuple(s) and "model" in tuple(s)
               for s in by_name.values())
    # every large enough, divisible, previously-replicated leaf now
    # shards over 'data'
    for name, spec in by_name.items():
        leaf = leaves[name]
        if "model" in tuple(spec):
            continue
        divisible = any(d % 4 == 0 and d > 0 for d in leaf.shape)
        if leaf.size >= 8 and divisible:
            assert "data" in tuple(spec), name
        else:
            assert spec == P(), name
    # storage actually shrinks: sharded leaf placement puts 1/4 per device
    mesh = make_mesh(n_data=4, n_model=2)
    params_s = jax.device_put(
        params, param_shardings(mesh, params, fsdp=True))
    big = [p for p in jax.tree_util.tree_leaves(params_s)
           if p.size >= 8 and any(d % 4 == 0 for d in p.shape)]
    assert big, "expected at least one FSDP-sharded leaf"
    for arr in big:
        shard_elems = arr.addressable_shards[0].data.size
        assert shard_elems * 4 <= arr.size * 2  # sharded over >= data axis


def test_fsdp_cli_end_to_end(tmp_path):
    """--fsdp trains through the production CLI on a 4x2 virtual mesh."""
    import numpy as np

    from fine_grained_gaussian_process_forcasting_tpu.train import cli

    results = cli.main([
        "--exp_name", "solar", "--synthetic", "--attn_type", "basic",
        "--model_name", "fsdp_smoke", "--num_epochs", "1", "--n_trials", "1",
        "--n_seeds", "1", "--pred_len", "8",
        "--out_dir", str(tmp_path), "--num_inducing", "8",
        "--max_train_samples", "64", "--max_valid_samples", "64",
        "--dp", "4", "--tp", "2", "--fsdp", "True",
    ])
    assert len(results) == 1
    assert np.isfinite(results[0]["mse"])


def test_fsdp_shards_tp_kernels_when_model_axis_is_one():
    """Pure data parallelism (--tp 1): the megatron rules are replication,
    so FSDP must shard the attention/FFN kernels — the bulk of the bytes —
    over 'data' instead of leaving them fully replicated."""
    from fine_grained_gaussian_process_forcasting_tpu.parallel.sharding import (
        fsdp_specs,
    )

    model, params, *_ = _setup()
    specs = fsdp_specs(params, n_data=4, n_model=1)
    flat = {
        "/".join(getattr(k, "key", str(k)) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P))[0]
    }
    big_kernels = [n for n in flat
                   if n.endswith("/kernel") and ("wq" in n or "ffn" in n)]
    assert big_kernels
    for name in big_kernels:
        assert "data" in tuple(flat[name]), (name, flat[name])
    # and with a real model axis, tp-sharded kernels get a 2-D
    # megatron x ZeRO layout (both axes present)
    specs2 = fsdp_specs(params, n_data=4, n_model=2)
    flat2 = {
        "/".join(getattr(k, "key", str(k)) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(
            specs2, is_leaf=lambda x: isinstance(x, P))[0]
    }
    two_d = [n for n, s in flat2.items()
             if "model" in tuple(s) and "data" in tuple(s)]
    assert two_d, "expected megatron x ZeRO 2-D sharded kernels"

"""End-to-end model + jitted trainer smoke tests (SURVEY.md s7 steps 2-4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fine_grained_gaussian_process_forcasting_tpu.models import (
    ForecastDenoising,
    Transformer,
)
from fine_grained_gaussian_process_forcasting_tpu.train import Trainer

SRC, TGT, DM, NH, PRED = 4, 4, 16, 4, 8
ENC_LEN, DEC_LEN = 24, 8


def _model(**kw):
    defaults = dict(
        src_input_size=SRC,
        tgt_input_size=TGT,
        d_model=DM,
        n_heads=NH,
        d_k=DM // NH,
        stack_size=1,
        pred_len=PRED,
        attn_type="basic",
        num_inducing=16,
    )
    defaults.update(kw)
    return ForecastDenoising(**defaults)


def _data(n=8, seed=0):
    rng = np.random.default_rng(seed)
    enc = rng.normal(size=(n, ENC_LEN, SRC)).astype(np.float32)
    dec = rng.normal(size=(n, DEC_LEN, TGT)).astype(np.float32)
    y = rng.normal(size=(n, PRED, 1)).astype(np.float32)
    return jnp.asarray(enc), jnp.asarray(dec), jnp.asarray(y)


def test_transformer_shapes():
    model = Transformer(d_model=DM, d_ff=DM * 4, d_k=4, d_v=4, n_heads=NH,
                        n_layers=2, attn_type="basic")
    enc = jnp.zeros((2, ENC_LEN, DM))
    dec = jnp.zeros((2, DEC_LEN, DM))
    variables = model.init(jax.random.PRNGKey(0), enc, dec)
    enc_out, dec_out = model.apply(variables, enc, dec)
    assert enc_out.shape == (2, ENC_LEN, DM)
    assert dec_out.shape == (2, DEC_LEN, DM)


@pytest.mark.parametrize(
    "flags",
    [
        dict(denoise=False, gp=False),  # plain "No-D"
        dict(denoise=True, gp=True),  # D-GP (flagship)
        dict(denoise=True, gp=False, no_noise=False),  # D-Iso
        dict(denoise=True, gp=False, no_noise=True),  # D-Pred
        dict(denoise=True, gp=True, residual=True),  # Res-Boos
        dict(denoise=False, gp=True, input_corrupt=True),  # D-C-Input
    ],
)
def test_forecast_denoising_modes(flags):
    model = _model(**flags)
    enc, dec, y = _data()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)},
        enc, dec, y, training=True,
    )
    out = model.apply(
        variables, enc, dec, y, training=True,
        rngs={"noise": jax.random.PRNGKey(3), "sampling": jax.random.PRNGKey(4)},
    )
    assert out.predictions.shape == (8, PRED, 1)
    assert np.isfinite(float(out.loss))
    assert np.isfinite(float(out.mse))
    # inference without y
    out_eval = model.apply(
        variables, enc, dec, training=False,
        rngs={"noise": jax.random.PRNGKey(5), "sampling": jax.random.PRNGKey(6)},
    )
    assert out_eval.predictions.shape == (8, PRED, 1)


def test_lstm_backbone_composite():
    model = _model(backbone="lstm", denoise=True, gp=True)
    enc, dec, y = _data()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)},
        enc, dec, y, training=True,
    )
    out = model.apply(
        variables, enc, dec, y, training=True,
        rngs={"noise": jax.random.PRNGKey(3), "sampling": jax.random.PRNGKey(4)},
    )
    assert out.predictions.shape == (8, PRED, 1)
    assert np.isfinite(float(out.loss))


def test_training_reduces_loss():
    """Minimal end-to-end slice: jitted scan-epoch training on a learnable
    synthetic mapping must cut the MSE."""
    rng = np.random.default_rng(1)
    n, nb = 32, 4
    enc = rng.normal(size=(n, ENC_LEN, SRC)).astype(np.float32)
    dec = rng.normal(size=(n, DEC_LEN, TGT)).astype(np.float32)
    # target = mean of first feature over last PRED decoder steps (learnable)
    y = dec[:, -PRED:, :1] * 0.5

    model = _model(denoise=True, gp=True)
    trainer = Trainer(model, d_model=DM, warmup_steps=100)

    class Split:
        pass

    batches = (
        enc.reshape(nb, n // nb, ENC_LEN, SRC),
        dec.reshape(nb, n // nb, DEC_LEN, TGT),
        y.reshape(nb, n // nb, PRED, 1),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), enc, dec, y)
    data = tuple(jnp.asarray(a) for a in batches)

    first_mse = None
    last_mse = None
    for epoch in range(30):
        state, loss, mse = trainer.train_epoch(state, data)
        if first_mse is None:
            first_mse = mse
        last_mse = mse
    assert np.isfinite(last_mse)
    assert last_mse < first_mse * 0.8, (first_mse, last_mse)


def test_gradients_flow_through_gp():
    """The ELBO must backprop into the GP variational params."""
    model = _model(denoise=True, gp=True)
    enc, dec, y = _data()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)},
        enc, dec, y, training=True,
    )

    def loss_fn(params):
        out = model.apply(
            {"params": params}, enc, dec, y, training=True,
            rngs={"noise": jax.random.PRNGKey(3),
                  "sampling": jax.random.PRNGKey(4)},
        )
        return out.loss

    grads = jax.grad(loss_fn)(variables["params"])
    gp_grads = grads["deep_gp"]
    total = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(gp_grads)
    )
    assert total > 0.0


def test_checkpoint_resume_roundtrip(tmp_path):
    """Full-state save/restore: resumed training continues identically."""
    model = _model(denoise=True, gp=True)
    rng = np.random.default_rng(3)
    enc = rng.normal(size=(8, ENC_LEN, SRC)).astype(np.float32)
    dec = rng.normal(size=(8, DEC_LEN, TGT)).astype(np.float32)
    y = rng.normal(size=(8, PRED, 1)).astype(np.float32)
    data = (jnp.asarray(enc[None]), jnp.asarray(dec[None]),
            jnp.asarray(y[None]))

    trainer = Trainer(model, d_model=DM, warmup_steps=100)
    state = trainer.init_state(jax.random.PRNGKey(0), enc, dec, y)
    state, _, _ = trainer.train_epoch(state, data)

    trainer.save_state(str(tmp_path), "ckpt", state)
    restored = trainer.restore_state(str(tmp_path), "ckpt", state)

    s1, l1, m1 = trainer.train_epoch(state, data)
    s2, l2, m2 = trainer.train_epoch(restored, data)
    assert np.isclose(l1, l2, rtol=1e-5), (l1, l2)
    assert np.isclose(m1, m2, rtol=1e-5)


def test_multilayer_gp_composite_end_to_end():
    """gp_hidden_dims reaches the DeepGP through the composite: a 1-hidden-
    layer deep-GP blur trains one step with finite loss and grads, and the
    param tree contains the extra layer (BASELINE config 4 capability)."""
    import optax
    from fine_grained_gaussian_process_forcasting_tpu.models.forecast_denoising import (
        ForecastDenoising,
    )

    model = ForecastDenoising(
        src_input_size=3, tgt_input_size=3, d_model=8, n_heads=2, d_k=4,
        stack_size=1, pred_len=4, attn_type="basic", gp=True, denoise=True,
        num_inducing=8, gp_hidden_dims=(4,))
    rng = jax.random.PRNGKey(0)
    enc = jax.random.normal(rng, (2, 12, 3))
    dec = jax.random.normal(rng, (2, 4, 3))
    y = jax.random.normal(rng, (2, 4, 1))
    variables = model.init({"params": rng, "noise": rng, "sampling": rng},
                           enc, dec, y, training=True)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("hidden0" in n or "layer0" in n for n in names), sorted(names)[:20]

    def loss_fn(p):
        return model.apply({"params": p}, enc, dec, y, training=True,
                           rngs={"noise": rng, "sampling": rng}).loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2)
                         for g in jax.tree_util.tree_leaves(grads)))
    assert bool(jnp.isfinite(loss)) and bool(jnp.isfinite(gnorm))


def test_gp_inject_and_lam_clip_knobs():
    """Round-4 root-cause knobs (RESULTS.md informer ablation):
    gp_inject moves the blur injection point with the ELBO unchanged;
    lam_clip_max=0 drops the ELBO term from the joint loss."""
    enc, dec, y = _data()
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "sampling": jax.random.PRNGKey(2)}

    ref = _model(denoise=True, gp=True)
    variables = ref.init(rngs, enc, dec, y, training=True)

    def run(**kw):
        m = _model(denoise=True, gp=True, **kw)
        return m.apply(variables, enc, dec, y, training=True,
                       rngs={"noise": jax.random.PRNGKey(3),
                             "sampling": jax.random.PRNGKey(4)})

    base = run()
    none = run(gp_inject="none")
    dec_only = run(gp_inject="dec")
    # inert-init GP still adds a LinearMean blur, so the predictions move
    assert not np.allclose(np.asarray(base.predictions),
                           np.asarray(none.predictions))
    assert not np.allclose(np.asarray(none.predictions),
                           np.asarray(dec_only.predictions))
    # 'none' leaves the denoiser inputs clean; ELBO term identical: the
    # joint loss minus the MSE matches base's (same posterior, same lam)
    assert np.isclose(float(base.loss) - float(base.mse),
                      float(none.loss) - float(none.mse), rtol=1e-5, atol=1e-7)
    # lam_clip_max=0 removes the ELBO from the loss entirely
    lam0 = run(lam_clip_max=0.0)
    assert np.isclose(float(lam0.loss), float(lam0.mse), rtol=0, atol=0)
    # exact blur rejects non-joint injection
    with pytest.raises(ValueError):
        _model(gp_kind="exact", gp_inject="dec").init(
            rngs, enc, dec, y, training=True)

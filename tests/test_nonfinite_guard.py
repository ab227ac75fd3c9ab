"""Non-finite-loss guard (train.trainer / train.multiseed / schedule).

Production fault detection the reference lacks (a NaN loss silently
poisons its run, ``train.py:158-167``).  Built after the exact-blur NaN
hunt: 'raise' reports the first bad step's index (the bisect primitive),
'skip' drops bad updates via ``optax.apply_if_finite``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fine_grained_gaussian_process_forcasting_tpu.models import (
    ForecastDenoising,
)
from fine_grained_gaussian_process_forcasting_tpu.train import Trainer
from fine_grained_gaussian_process_forcasting_tpu.train.trainer import (
    NonFiniteLossError,
)

SRC, TGT, DM, NH, PRED = 4, 4, 16, 4, 8
ENC_LEN, DEC_LEN = 24, 8


def _model():
    return ForecastDenoising(
        src_input_size=SRC, tgt_input_size=TGT, d_model=DM, n_heads=NH,
        d_k=DM // NH, stack_size=1, pred_len=PRED, attn_type="basic",
        num_inducing=16, denoise=False, gp=False)


def _batched_data(nb=4, bs=8, poison_batch=None, seed=0):
    rng = np.random.default_rng(seed)
    enc = rng.normal(size=(nb, bs, ENC_LEN, SRC)).astype(np.float32)
    dec = rng.normal(size=(nb, bs, DEC_LEN, TGT)).astype(np.float32)
    y = (dec[..., -PRED:, :1] * 0.5).astype(np.float32)
    if poison_batch is not None:
        y[poison_batch, 0, 0, 0] = np.nan
    return tuple(jnp.asarray(a) for a in (enc, dec, y))


def _init(trainer, data):
    enc, dec, y = data
    return trainer.init_state(jax.random.PRNGKey(0), enc[0], dec[0], y[0])


def test_raise_mode_reports_first_bad_step():
    data = _batched_data(poison_batch=2)
    trainer = Trainer(_model(), d_model=DM, warmup_steps=100,
                      nonfinite_guard="raise")
    state = _init(trainer, data)
    with pytest.raises(NonFiniteLossError, match="batch 2") as ei:
        trainer.train_epoch(state, data)
    assert ei.value.step == 2
    # the advertised catch-and-bisect workflow: pre-epoch state must
    # survive the raising call (raise mode does not donate buffers)
    trainer.eval_epoch(state, data)  # would fail on deleted buffers
    assert all(bool(jnp.all(jnp.isfinite(p)))
               for p in jax.tree_util.tree_leaves(state.params))


def test_raise_mode_clean_run_passes():
    data = _batched_data()
    trainer = Trainer(_model(), d_model=DM, warmup_steps=100,
                      nonfinite_guard="raise")
    state = _init(trainer, data)
    state, loss, mse = trainer.train_epoch(state, data)
    assert np.isfinite(loss)


def test_skip_mode_keeps_params_finite():
    data = _batched_data(poison_batch=1)
    trainer = Trainer(_model(), d_model=DM, warmup_steps=100,
                      nonfinite_guard="skip")
    state = _init(trainer, data)
    for _ in range(2):
        state, loss, mse = trainer.train_epoch(state, data)
    # the poisoned batch makes the SUMMED loss NaN, but every update
    # from a bad step was dropped: params stay finite and training on
    # the clean batches continues
    assert all(bool(jnp.all(jnp.isfinite(p)))
               for p in jax.tree_util.tree_leaves(state.params))


def test_off_mode_is_reference_semantics():
    data = _batched_data(poison_batch=1)
    trainer = Trainer(_model(), d_model=DM, warmup_steps=100)
    state = _init(trainer, data)
    state, loss, mse = trainer.train_epoch(state, data)
    # NaN poisons params — exactly what the reference does
    finite = all(bool(jnp.all(jnp.isfinite(p)))
                 for p in jax.tree_util.tree_leaves(state.params))
    assert not finite


def test_skip_matches_off_on_clean_data():
    data = _batched_data()
    t_off = Trainer(_model(), d_model=DM, warmup_steps=100)
    t_skip = Trainer(_model(), d_model=DM, warmup_steps=100,
                     nonfinite_guard="skip")
    s_off = _init(t_off, data)
    s_skip = _init(t_skip, data)
    s_off, loss_off, _ = t_off.train_epoch(s_off, data)
    s_skip, loss_skip, _ = t_skip.train_epoch(s_skip, data)
    np.testing.assert_allclose(loss_off, loss_skip, rtol=1e-6)
    # single-ulp slack: apply_if_finite routes the inner update through
    # lax.cond, which may fuse differently from the inlined chain
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        jax.device_get(s_off.params), jax.device_get(s_skip.params))


def test_multiseed_guard():
    from fine_grained_gaussian_process_forcasting_tpu.train.multiseed import (
        MultiSeedTrainer,
    )

    data = _batched_data(poison_batch=1)
    enc, dec, y = data
    trainer = MultiSeedTrainer(_model(), d_model=DM, n_seeds=2,
                               warmup_steps=100, nonfinite_guard="raise")
    state = trainer.init_state([11, 22], enc[0], dec[0], y[0])
    with pytest.raises(NonFiniteLossError, match="seed indices"):
        trainer.train_epoch(state, data)

    t_skip = MultiSeedTrainer(_model(), d_model=DM, n_seeds=2,
                              warmup_steps=100, nonfinite_guard="skip")
    s = t_skip.init_state([11, 22], enc[0], dec[0], y[0])
    s, loss, mse = t_skip.train_epoch(s, data)
    assert all(bool(jnp.all(jnp.isfinite(p)))
               for p in jax.tree_util.tree_leaves(s.params))


def test_invalid_guard_rejected():
    with pytest.raises(ValueError):
        Trainer(_model(), d_model=DM, nonfinite_guard="bogus")

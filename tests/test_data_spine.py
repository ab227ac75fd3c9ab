"""Golden shape/behavior tests for formatters + window sampler.

Mirrors the reference's de-facto contracts: shapes from
``Utils/base_train.py:66-95`` and per-entity scaling from
``data/electricity.py:75-175``.
"""

import numpy as np
import pandas as pd
import pytest

from fine_grained_gaussian_process_forcasting_tpu.data import (
    ExperimentConfig,
    batch_sampled_data,
    sample_windows,
)
from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)

ALL_EXPERIMENTS = [
    "electricity",
    "solar",
    "traffic",
    "exchange",
    "covid",
    "air_quality",
    "watershed",
]


@pytest.mark.parametrize("experiment", ALL_EXPERIMENTS)
def test_formatter_roundtrip_shapes(experiment):
    pred_len = 24
    config = ExperimentConfig(pred_len, experiment, root_folder="/tmp/fgp_outputs")
    formatter = config.make_data_formatter()
    params = formatter.get_experiment_params()

    df = make_synthetic_frame(experiment, num_entities=3, steps_per_entity=700)
    out = formatter.transform_data(df)

    # Transformed frame keeps all columns in the definition.
    for name, _, _ in params["column_definition"]:
        assert name in out.columns

    # Real inputs are z-scored: per-entity (electricity family) or global
    # (traffic) — either way the pooled mean should be ~0.
    target_col = [
        t[0] for t in params["column_definition"] if t[2].name == "TARGET"
    ][0]
    assert abs(out[target_col].mean()) < 0.3
    assert 0.3 < out[target_col].std() < 3.0


@pytest.mark.parametrize("experiment", ["electricity", "watershed"])
def test_window_shapes(experiment):
    pred_len = 24
    config = ExperimentConfig(pred_len, experiment, root_folder="/tmp/fgp_outputs")
    formatter = config.make_data_formatter()
    params = formatter.get_experiment_params()
    df = formatter.transform_data(
        make_synthetic_frame(experiment, num_entities=3, steps_per_entity=700)
    )

    T = params["total_time_steps"]
    enc_len = params["num_encoder_steps"]
    dec_len = T - enc_len - pred_len
    np.random.seed(2436)
    split = sample_windows(
        df, 128, T, enc_len, pred_len, params["column_definition"]
    )
    n_features = len(
        [t for t in params["column_definition"] if t[2].name not in ("ID", "TIME")]
    )
    assert split.enc_inputs.shape == (128, enc_len, n_features)
    assert split.dec_inputs.shape == (128, dec_len, n_features)
    assert split.outputs.shape == (128, pred_len, 1)

    # Window content: every row of a window must equal consecutive rows of
    # the frame for its entity.
    ids = split.identifiers
    real = [i for i in range(len(split)) if ids[i] is not None]
    assert len(real) == 128  # 3*(700-T+1) windows > 128 requested


def test_window_zero_padding_when_scarce():
    """max_samples > available => zero tail (``Utils/base_train.py:59-71``)."""
    experiment = "electricity"
    pred_len = 24
    config = ExperimentConfig(pred_len, experiment, root_folder="/tmp/fgp_outputs")
    formatter = config.make_data_formatter()
    params = formatter.get_experiment_params()
    T = params["total_time_steps"]
    df = formatter.transform_data(
        make_synthetic_frame(experiment, num_entities=1, steps_per_entity=T + 9)
    )
    np.random.seed(2436)
    split = sample_windows(
        df, 64, T, params["num_encoder_steps"], pred_len, params["column_definition"]
    )
    assert len(split) == 64
    n_real = 10  # T+9 rows => 10 windows
    assert np.abs(split.enc_inputs[n_real:]).sum() == 0.0
    assert np.abs(split.enc_inputs[:n_real]).sum() > 0.0


def test_batch_sampled_data_splits():
    experiment = "electricity"
    pred_len = 24
    config = ExperimentConfig(pred_len, experiment, root_folder="/tmp/fgp_outputs")
    formatter = config.make_data_formatter()
    params = formatter.get_experiment_params()
    df = formatter.transform_data(
        make_synthetic_frame(experiment, num_entities=3, steps_per_entity=900)
    )
    train, valid, test = batch_sampled_data(
        df,
        0.8,
        (256, 128),
        params["total_time_steps"],
        params["num_encoder_steps"],
        pred_len,
        params["column_definition"],
        batch_size=64,
    )
    assert train.n_batches == 4
    assert valid.n_batches == 2
    assert test.n_batches == 2
    for enc, dec, y in train:
        assert enc.shape[0] == 64
        assert y.shape == (64, pred_len, 1)
        break


def test_window_content_matches_frame():
    """The gathered windows must be contiguous rows of the source frame."""
    experiment = "electricity"
    pred_len = 24
    config = ExperimentConfig(pred_len, experiment, root_folder="/tmp/fgp_outputs")
    formatter = config.make_data_formatter()
    params = formatter.get_experiment_params()
    T = params["total_time_steps"]
    df = formatter.transform_data(
        make_synthetic_frame(experiment, num_entities=2, steps_per_entity=T + 50)
    )
    df = df.sort_values(by=["id", "hours_from_start"])
    np.random.seed(0)
    split = sample_windows(df, 8, T, params["num_encoder_steps"], pred_len,
                           params["column_definition"])
    feat_cols = [
        t[0] for t in params["column_definition"] if t[2].name not in ("ID", "TIME")
    ]
    for i in range(8):
        ent = split.identifiers[i]
        sub = df[df["id"] == ent][feat_cols].to_numpy(dtype=np.float32)
        w = split.inputs[i]
        # find the window's start row by matching the first row
        hits = np.where((np.abs(sub[: len(sub) - T + 1] - w[0]) < 1e-6).all(axis=1))[0]
        assert len(hits) >= 1
        ok = any(np.allclose(sub[h : h + T], w, atol=1e-6) for h in hits)
        assert ok


def test_categorical_misalignment_quirk():
    """Pins the replicated reference quirk (``data/electricity.py:171-173``):
    transform_inputs assigns categorical codes positionally from the
    UNFILTERED frame's head rows, so whenever an entity shorter than
    total_time_steps is dropped, the surviving rows' categorical column is
    misaligned (it carries codes from rows that were filtered out)."""
    from fine_grained_gaussian_process_forcasting_tpu.data.formatters.electricity import (
        ElectricityFormatter,
    )

    fmt = ElectricityFormatter(pred_len=24)
    T = fmt.get_fixed_params()["total_time_steps"]
    long_df = make_synthetic_frame("electricity", num_entities=2,
                                   steps_per_entity=T + 10)
    # make entity 0 too short: it gets dropped by the length filter
    short_mask = (long_df["id"] == 0.0) & (long_df["hours_from_start"] >= 5)
    df = long_df[~short_mask].reset_index(drop=True)

    out = fmt.transform_data(df)
    # survivor rows are all entity 1 ...
    assert (out["id"] == 1.0).all()
    # ... but their categorical codes are the unfiltered frame's head rows:
    # 5 leading rows of entity 0's code, then entity 1's code
    expected = fmt._cat_scalers["categorical_id"].transform(
        df["categorical_id"].apply(str)[: len(out)])
    np.testing.assert_array_equal(out["categorical_id"].to_numpy(), expected)
    assert (expected[:5] != expected[5]).all()  # the misalignment is real


def test_full_etl_registry_surface():
    """Every reference-registered experiment has a download handler; names
    without a formatter raise a clear error instead of KeyError
    (reference data_loader.py:36-94 registers 11 experiments)."""
    from fine_grained_gaussian_process_forcasting_tpu.data.download import (
        DOWNLOAD_FUNCTIONS,
    )
    from fine_grained_gaussian_process_forcasting_tpu.data.experiment import (
        ExperimentConfig,
    )

    assert set(ExperimentConfig.default_experiments) == set(DOWNLOAD_FUNCTIONS)
    for exp in ("weather", "ETTm2", "camel", "favorita"):
        with pytest.raises(ValueError, match="no data formatter"):
            ExperimentConfig(96, exp, root_folder=".").make_data_formatter()


def test_synthetic_schemas_for_unformatted_experiments(tmp_path):
    """--synthetic covers weather/ETTm2/camel (the ETL-only experiments)."""
    for exp, target in (("weather", "T (degC)"), ("ETTm2", "OT"),
                        ("camel", "streamflow")):
        df = make_synthetic_frame(exp, num_entities=2, steps_per_entity=50)
        assert target in df.columns, (exp, df.columns)
        assert {"id", "categorical_id", "day_of_week"} <= set(df.columns)
        assert len(df) == 100


def test_structured_synthetic_noise():
    """ar1/gp noise kinds are temporally correlated; iid is not."""
    from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
        _noise,
    )

    rng = np.random.default_rng(0)
    acs = {}
    for kind in ("iid", "ar1", "gp"):
        eps = _noise(np.random.default_rng(0), 20000, kind)
        acs[kind] = float(np.corrcoef(eps[:-1], eps[1:])[0, 1])
        # roughly unit scale relative to the requested 0.3
        assert 0.15 < eps.std() < 0.45, (kind, eps.std())
    assert abs(acs["iid"]) < 0.05, acs
    assert acs["ar1"] > 0.85, acs
    assert acs["gp"] > 0.95, acs

"""Electricity formatter — the base per-entity-scaling implementation.

Re-design of the reference's ``data/electricity.py:27-255``.  Behavior is
identical: per-entity ``StandardScaler`` over the real inputs and the target,
``LabelEncoder`` over categoricals, entities shorter than
``total_time_steps`` dropped, and the same fixed/model params.
"""

from __future__ import annotations

import pandas as pd
import sklearn.preprocessing

from fine_grained_gaussian_process_forcasting_tpu.data.base import (
    DataTypes,
    GenericDataFormatter,
    InputTypes,
    extract_cols_from_data_type,
    get_single_col_by_input_type,
)


class ElectricityFormatter(GenericDataFormatter):
    """Per-entity z-score normalization (reference ``data/electricity.py``)."""

    _column_definition = [
        ("id", DataTypes.REAL_VALUED, InputTypes.ID),
        ("hours_from_start", DataTypes.REAL_VALUED, InputTypes.TIME),
        ("power_usage", DataTypes.REAL_VALUED, InputTypes.TARGET),
        ("hour", DataTypes.REAL_VALUED, InputTypes.KNOWN_INPUT),
        ("day_of_week", DataTypes.REAL_VALUED, InputTypes.KNOWN_INPUT),
        ("categorical_id", DataTypes.CATEGORICAL, InputTypes.STATIC_INPUT),
    ]

    def __init__(self, pred_len: int):
        self.identifiers = None
        self._real_scalers = None
        self._cat_scalers = None
        self._target_scaler = None
        self._num_classes_per_cat_input = None
        self.pred_len = pred_len
        self._time_steps = self.get_fixed_params()["total_time_steps"]

    # ------------------------------------------------------------------ #

    def transform_data(self, df: pd.DataFrame) -> pd.DataFrame:
        """Calibrate scalers on the full frame, then transform it.

        (The reference fits scalers on the *whole* dataframe, not the train
        split — ``data/electricity.py:57-72``; replicated faithfully.)
        """
        self.set_scalers(df)
        return self.transform_inputs(df)

    def set_scalers(self, df: pd.DataFrame) -> None:
        column_definitions = self.get_column_definition()
        id_column = get_single_col_by_input_type(InputTypes.ID, column_definitions)
        target_column = get_single_col_by_input_type(
            InputTypes.TARGET, column_definitions
        )
        real_inputs = extract_cols_from_data_type(
            DataTypes.REAL_VALUED,
            column_definitions,
            {InputTypes.ID, InputTypes.TIME},
        )

        self._real_scalers = {}
        self._target_scaler = {}
        identifiers = []
        for identifier, sliced in df.groupby(id_column):
            if len(sliced) >= self._time_steps:
                data = sliced[real_inputs].values
                targets = sliced[[target_column]].values
                self._real_scalers[identifier] = (
                    sklearn.preprocessing.StandardScaler().fit(data)
                )
                self._target_scaler[identifier] = (
                    sklearn.preprocessing.StandardScaler().fit(targets)
                )
            identifiers.append(identifier)

        categorical_inputs = extract_cols_from_data_type(
            DataTypes.CATEGORICAL,
            column_definitions,
            {InputTypes.ID, InputTypes.TIME},
        )
        categorical_scalers = {}
        num_classes = []
        for col in categorical_inputs:
            srs = df[col].apply(str)
            categorical_scalers[col] = sklearn.preprocessing.LabelEncoder()
            categorical_scalers[col].fit(srs.values)
            num_classes.append(srs.nunique())

        self._cat_scalers = categorical_scalers
        self._num_classes_per_cat_input = num_classes
        self.identifiers = identifiers

    def transform_inputs(self, df: pd.DataFrame) -> pd.DataFrame:
        if self._real_scalers is None and self._cat_scalers is None:
            raise ValueError("Scalers have not been set!")

        column_definitions = self.get_column_definition()
        id_col = get_single_col_by_input_type(InputTypes.ID, column_definitions)
        real_inputs = extract_cols_from_data_type(
            DataTypes.REAL_VALUED,
            column_definitions,
            {InputTypes.ID, InputTypes.TIME},
        )
        categorical_inputs = extract_cols_from_data_type(
            DataTypes.CATEGORICAL,
            column_definitions,
            {InputTypes.ID, InputTypes.TIME},
        )

        df_list = []
        for identifier, sliced in df.groupby(id_col):
            if len(sliced) >= self._time_steps:
                sliced_copy = sliced.copy()
                sliced_copy[real_inputs] = self._real_scalers[identifier].transform(
                    sliced_copy[real_inputs].values
                )
                df_list.append(sliced_copy)
        output = pd.concat(df_list, axis=0)

        for col in categorical_inputs:
            # Replicated reference quirk (``data/electricity.py:171-173``):
            # codes are taken from the *unfiltered* frame's head rows and
            # assigned positionally onto the filtered, re-concatenated
            # output — misaligned whenever entities shorter than
            # total_time_steps were dropped.  Pinned by
            # tests/test_data_spine.py::test_categorical_misalignment_quirk.
            string_df = df[col].apply(str)
            output[col] = self._cat_scalers[col].transform(string_df[: len(output)])
        return output

    def format_predictions(self, predictions: pd.DataFrame):
        """Invert target scaling per entity (``data/electricity.py:176-212``)."""
        if self._target_scaler is None:
            raise ValueError("Scalers have not been set!")

        column_names = predictions.columns
        df_list = []
        for identifier, sliced in predictions.groupby("identifier"):
            sliced_copy = sliced.copy()
            target_scaler = self._target_scaler[identifier]
            for col in column_names:
                if col not in {"identifier"}:
                    values = sliced_copy[col].to_numpy().reshape(-1, 1)
                    sliced_copy[col] = target_scaler.inverse_transform(
                        values
                    ).reshape(-1)
            df_list.append(sliced_copy)
        if not df_list:
            return None
        return pd.concat(df_list, axis=0)

    # ------------------------------------------------------------------ #

    def get_default_model_params(self) -> dict:
        return {
            "hidden_layer_size": [8],
            "minibatch_size": [256],
            "num_heads": 8,
            "stack_size": [1],
            "context_lengths": [1, 3, 6, 9],
        }

    def get_fixed_params(self) -> dict:
        decoder_steps = self.pred_len
        return {
            "total_time_steps": 192 + decoder_steps + self.pred_len,
            "num_encoder_steps": 192,
            "num_decoder_steps": decoder_steps,
            "num_epochs": 50,
            "early_stopping_patience": 5,
            "multiprocessing_workers": 5,
        }

    def get_num_samples_for_calibration(self, num_train: int = -1):
        if num_train == -1:
            return 32000, 3840
        return num_train, 3840

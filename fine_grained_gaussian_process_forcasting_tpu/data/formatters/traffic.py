"""Traffic formatter — global (not per-entity) scaling.

Re-design of the reference's standalone ``data/traffic.py:24-194``: a single
``StandardScaler`` over all entities' real inputs and one over the target.
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


class TrafficFormatter(GenericDataFormatter):
    _column_definition = [
        ("id", DataTypes.REAL_VALUED, InputTypes.ID),
        ("hours_from_start", DataTypes.REAL_VALUED, InputTypes.TIME),
        ("values", DataTypes.REAL_VALUED, InputTypes.TARGET),
        ("time_on_day", DataTypes.REAL_VALUED, InputTypes.KNOWN_INPUT),
        ("day_of_week", DataTypes.REAL_VALUED, InputTypes.KNOWN_INPUT),
        ("categorical_id", DataTypes.CATEGORICAL, InputTypes.STATIC_INPUT),
    ]

    def __init__(self, pred_len: int):
        self.pred_len = pred_len
        self.identifiers = None
        self._real_scalers = None
        self._cat_scalers = None
        self._target_scaler = None
        self._num_classes_per_cat_input = None

    def transform_data(self, df: pd.DataFrame) -> pd.DataFrame:
        self.set_scalers(df)
        return self.transform_inputs(df)

    def set_scalers(self, df: pd.DataFrame) -> None:
        column_definitions = self.get_column_definition()
        id_column = get_single_col_by_input_type(InputTypes.ID, column_definitions)
        target_column = get_single_col_by_input_type(
            InputTypes.TARGET, column_definitions
        )
        self.identifiers = list(df[id_column].unique())

        real_inputs = extract_cols_from_data_type(
            DataTypes.REAL_VALUED,
            column_definitions,
            {InputTypes.ID, InputTypes.TIME},
        )
        data = df[real_inputs].values
        self._real_scalers = sklearn.preprocessing.StandardScaler().fit(data)
        self._target_scaler = sklearn.preprocessing.StandardScaler().fit(
            df[[target_column]].values
        )

        categorical_inputs = extract_cols_from_data_type(
            DataTypes.CATEGORICAL,
            column_definitions,
            {InputTypes.ID, InputTypes.TIME},
        )
        categorical_scalers = {}
        num_classes = []
        for col in categorical_inputs:
            srs = df[col].apply(str)
            categorical_scalers[col] = sklearn.preprocessing.LabelEncoder().fit(
                srs.values
            )
            num_classes.append(srs.nunique())
        self._cat_scalers = categorical_scalers
        self._num_classes_per_cat_input = num_classes

    def transform_inputs(self, df: pd.DataFrame) -> pd.DataFrame:
        output = df.copy()
        if self._real_scalers is None and self._cat_scalers is None:
            raise ValueError("Scalers have not been set!")

        column_definitions = self.get_column_definition()
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
        output[real_inputs] = self._real_scalers.transform(df[real_inputs].values)
        for col in categorical_inputs:
            string_df = df[col].apply(str)
            output[col] = self._cat_scalers[col].transform(string_df)
        return output

    def format_predictions(self, predictions: pd.DataFrame) -> pd.DataFrame:
        output = predictions.copy()
        for col in predictions.columns:
            if col not in {"identifier"}:
                values = predictions[col].to_numpy().reshape(-1, 1)
                output[col] = self._target_scaler.inverse_transform(values).reshape(-1)
        return output

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

    def get_default_model_params(self) -> dict:
        return {
            "hidden_layer_size": [8],
            "minibatch_size": [256],
            "num_heads": 8,
            "stack_size": [1],
            "context_lengths": [1, 3, 6, 9],
        }

    def get_num_samples_for_calibration(self, num_train: int = -1):
        if num_train == -1:
            return 32000, 3840
        return num_train, 3840

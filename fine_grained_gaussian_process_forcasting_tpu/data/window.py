"""Vectorized sliding-window sampling and device-friendly batching.

Re-design of the reference's host-side hot loop
(``Utils/base_train.py:29-153``).  Semantics are preserved exactly —

- a window of ``time_steps`` rows per (entity, end-position), entities
  shorter than ``time_steps`` skipped (``Utils/base_train.py:42-50``);
- random subsample of ``max_samples`` windows without replacement under
  the fixed seed 2436 (``Utils/base_train.py:52-63,117-118``);
- when fewer windows exist than ``max_samples``, the output arrays keep
  their ``max_samples`` leading dim and the tail stays all-zero, exactly
  like the reference's pre-allocated ``np.zeros`` buffers
  (``Utils/base_train.py:66-71``); pass ``pad_incomplete=False`` to get
  only real windows instead;
- splits: train = first ``train_percent`` rows, valid = next half of the
  remainder, test = the *whole* frame (``Utils/base_train.py:124-129`` —
  intentional reference behavior, replicated);
- encoder block = first ``num_encoder_steps`` rows, decoder block = rows
  ``[num_encoder_steps : -pred_len]``, target = last ``pred_len`` rows.

— but the per-window pandas ``iloc`` loop is replaced by a single numpy
fancy-index gather over a contiguous value matrix, which is orders of
magnitude faster and produces arrays ready for one ``jax.device_put``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import numpy as np
import pandas as pd

from fine_grained_gaussian_process_forcasting_tpu.data.base import (
    InputTypes,
    get_single_col_by_input_type,
)


@dataclasses.dataclass
class WindowedSplit:
    """All windows of one split, as dense float32 arrays."""

    enc_inputs: np.ndarray  # (N, num_encoder_steps, F)
    dec_inputs: np.ndarray  # (N, time_steps - num_encoder_steps - pred_len, F)
    outputs: np.ndarray  # (N, pred_len, 1)
    inputs: np.ndarray  # (N, time_steps, F) full windows
    input_arima: np.ndarray  # (N, time_steps - pred_len, 1) target history
    identifiers: np.ndarray  # (N,) object — entity id per window

    def __len__(self) -> int:
        return self.enc_inputs.shape[0]


@dataclasses.dataclass
class BatchedSplit:
    """A split regrouped into fixed-size batches (drop-last, like the
    reference's ``DataLoader(..., drop_last=True)``).

    Arrays are shaped ``(n_batches, batch_size, ...)`` so a training loop
    can ``lax.scan`` over the leading dim after a single device_put.
    """

    enc: np.ndarray  # (B, bs, enc_len, F)
    dec: np.ndarray  # (B, bs, dec_len, F)
    y: np.ndarray  # (B, bs, pred_len, 1)

    @property
    def n_batches(self) -> int:
        return self.enc.shape[0]

    def __iter__(self):
        for i in range(self.n_batches):
            yield self.enc[i], self.dec[i], self.y[i]


def _entity_windows(
    df: pd.DataFrame,
    id_col: str,
    time_steps: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Global start index + entity id of every valid window.

    Returns (starts, entity_ids, order) where ``starts[i]`` indexes into the
    dataframe's positional row order.
    """
    codes, _ = pd.factorize(df[id_col].to_numpy())
    starts = []
    entity_of_window = []
    # Entities appear in contiguous runs because callers sort by [id, time]
    # first (reference ``Utils/base_train.py:122``); groupby order in the
    # reference is sorted-by-key, so iterate runs in sorted-key order.
    n = len(codes)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64)
    boundaries = np.flatnonzero(np.diff(codes)) + 1
    run_starts = np.concatenate([[0], boundaries])
    run_ends = np.concatenate([boundaries, [n]])
    run_keys = codes[run_starts]
    # Reference iterates ``df.groupby(id_col)`` => sorted unique keys. A
    # single sorted frame has one run per key, already key-ordered; handle
    # the general case by sorting runs by key.
    order = np.argsort(run_keys, kind="stable")
    for r in order:
        s, e = run_starts[r], run_ends[r]
        num_entries = e - s
        if num_entries >= time_steps:
            w = np.arange(s, e - time_steps + 1, dtype=np.int64)
            starts.append(w)
            entity_of_window.append(np.full(len(w), run_keys[r], dtype=np.int64))
    if not starts:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), codes
    return np.concatenate(starts), np.concatenate(entity_of_window), codes


def sample_windows(
    df: pd.DataFrame,
    max_samples: int,
    time_steps: int,
    num_encoder_steps: int,
    pred_len: int,
    column_definition: Sequence,
    pad_incomplete: bool = True,
) -> WindowedSplit:
    """Extract (enc, dec, y) windows; vectorized equivalent of
    ``sample_train_val_test`` (``Utils/base_train.py:29-100``)."""
    id_col = get_single_col_by_input_type(InputTypes.ID, column_definition)
    target_col = get_single_col_by_input_type(InputTypes.TARGET, column_definition)
    enc_input_cols = [
        tup[0]
        for tup in column_definition
        if tup[2] not in {InputTypes.ID, InputTypes.TIME}
    ]

    starts, _, _ = _entity_windows(df, id_col, time_steps)
    num_valid = len(starts)

    if 0 < max_samples < num_valid:
        sel = np.random.choice(num_valid, max_samples, replace=False)
        starts = starts[sel]
    else:
        # Reference resamples *all* windows without replacement (a shuffle)
        # when max_samples exceeds availability (``Utils/base_train.py:59-63``).
        sel = np.random.choice(num_valid, num_valid, replace=False)
        starts = starts[sel]

    n_real = len(starts)
    n_out = max_samples if (pad_incomplete and max_samples > 0) else n_real
    input_size = len(enc_input_cols)

    values = df[enc_input_cols].to_numpy(dtype=np.float32, copy=False)
    targets = df[[target_col]].to_numpy(dtype=np.float32, copy=False)
    ids = df[id_col].to_numpy()

    inputs = np.zeros((n_out, time_steps, input_size), dtype=np.float32)
    outputs_full = np.zeros((n_out, time_steps, 1), dtype=np.float32)
    identifiers = np.empty((n_out,), dtype=object)
    identifiers[:] = None

    if n_real:
        # One gather per matrix — multithreaded C++ engine when available,
        # numpy fancy-index otherwise (see ``native/fgp_native.cpp``).
        from fine_grained_gaussian_process_forcasting_tpu import native

        inputs[:n_real] = native.gather_windows(values, starts, time_steps)
        outputs_full[:n_real] = native.gather_windows(targets, starts,
                                                      time_steps)
        identifiers[:n_real] = ids[starts]

    dec_len = time_steps - num_encoder_steps - pred_len
    return WindowedSplit(
        enc_inputs=inputs[:, :num_encoder_steps, :],
        dec_inputs=inputs[:, num_encoder_steps : num_encoder_steps + dec_len, :],
        outputs=outputs_full[:, -pred_len:, :],
        inputs=inputs,
        input_arima=outputs_full[:, :-pred_len, :],
        identifiers=identifiers,
    )


def _to_batches(split: WindowedSplit, batch_size: int) -> BatchedSplit:
    n = (len(split) // batch_size) * batch_size
    nb = n // batch_size

    def regroup(a: np.ndarray) -> np.ndarray:
        return a[:n].reshape(nb, batch_size, *a.shape[1:])

    return BatchedSplit(
        enc=regroup(split.enc_inputs),
        dec=regroup(split.dec_inputs),
        y=regroup(split.outputs),
    )


def batch_sampled_data(
    data: pd.DataFrame,
    train_percent: float,
    max_samples: Tuple[int, int],
    time_steps: int,
    num_encoder_steps: int,
    pred_len: int,
    column_definition: Sequence,
    batch_size: int,
    seed: int = 2436,
    pad_incomplete: bool = True,
) -> Tuple[BatchedSplit, BatchedSplit, BatchedSplit]:
    """Split -> window-sample -> batch; equivalent of
    ``batch_sampled_data`` (``Utils/base_train.py:100-153``)."""
    rng_state = np.random.get_state()
    np.random.seed(seed)
    try:
        time_col = get_single_col_by_input_type(InputTypes.TIME, column_definition)
        id_col = get_single_col_by_input_type(InputTypes.ID, column_definition)
        data = data.sort_values(by=[id_col, time_col])

        train_len = int(len(data) * train_percent)
        valid_len = int((len(data) - train_len) / 2)
        train = data[:train_len]
        valid = data[train_len:-valid_len] if valid_len else data[train_len:]
        test = data  # the whole frame — reference behavior

        train_max, valid_max = max_samples
        kw = dict(
            time_steps=time_steps,
            num_encoder_steps=num_encoder_steps,
            pred_len=pred_len,
            column_definition=column_definition,
            pad_incomplete=pad_incomplete,
        )
        sample_train = sample_windows(train, train_max, **kw)
        sample_valid = sample_windows(valid, valid_max, **kw)
        sample_test = sample_windows(test, valid_max, **kw)
    finally:
        np.random.set_state(rng_state)

    return (
        _to_batches(sample_train, batch_size),
        _to_batches(sample_valid, batch_size),
        _to_batches(sample_test, batch_size),
    )

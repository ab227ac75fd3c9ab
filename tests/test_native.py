"""Native C++ data-engine parity tests (numpy fallback vs compiled lib)."""

import numpy as np
import pytest

from fine_grained_gaussian_process_forcasting_tpu import native


def test_native_builds():
    # the build toolchain is part of the environment contract
    assert native.available(), "g++ build of fgp_native failed"


def test_gather_windows_matches_numpy():
    rng = np.random.default_rng(0)
    values = rng.normal(size=(500, 7)).astype(np.float32)
    starts = rng.integers(0, 500 - 32, size=64).astype(np.int64)
    got = native.gather_windows(values, starts, 32)
    idx = starts[:, None] + np.arange(32)
    np.testing.assert_array_equal(got, values[idx])


def test_standardize_per_entity_matches_sklearn():
    import sklearn.preprocessing

    rng = np.random.default_rng(1)
    values = rng.normal(loc=3.0, scale=2.5, size=(300, 4)).astype(np.float32)
    offsets = np.array([0, 120, 300], dtype=np.int64)
    v2, means, stds = native.standardize_per_entity(values.copy(), offsets)
    for e, (lo, hi) in enumerate([(0, 120), (120, 300)]):
        ref = sklearn.preprocessing.StandardScaler().fit_transform(
            values[lo:hi].astype(np.float64))
        np.testing.assert_allclose(v2[lo:hi], ref, rtol=1e-4, atol=1e-4)


def test_valid_window_starts():
    offsets = np.array([0, 10, 13, 30], dtype=np.int64)
    starts = native.valid_window_starts(offsets, time_steps=5)
    # entity 0: rows 0..9 -> starts 0..5; entity 1: len 3 < 5 -> none;
    # entity 2: rows 13..29 -> starts 13..25
    expected = np.concatenate([np.arange(0, 6), np.arange(13, 26)])
    np.testing.assert_array_equal(np.sort(starts), expected)


def test_numpy_fallback_paths_match_native(monkeypatch):
    """With the compiled library unavailable, the numpy fallbacks must
    produce identical results."""
    rng = np.random.default_rng(3)
    values = rng.normal(size=(300, 5)).astype(np.float32)
    starts = rng.integers(0, 300 - 16, size=32).astype(np.int64)
    offsets = np.array([0, 150, 300], dtype=np.int64)

    native_gather = native.gather_windows(values, starts, 16)
    native_std = native.standardize_per_entity(values.copy(), offsets)
    native_starts = native.valid_window_starts(offsets, 16)

    monkeypatch.setattr(native, "_load", lambda: None)
    fb_gather = native.gather_windows(values, starts, 16)
    fb_std = native.standardize_per_entity(values.copy(), offsets)
    fb_starts = native.valid_window_starts(offsets, 16)

    np.testing.assert_array_equal(fb_gather, native_gather)
    np.testing.assert_allclose(fb_std[0], native_std[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fb_std[1], native_std[1], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.sort(fb_starts), np.sort(native_starts))

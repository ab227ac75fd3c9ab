"""Checksum/schema manifest + --from_local_csv on-ramp (VERDICT r2 item 8)."""

import os
import re

import numpy as np
import pandas as pd
import pytest

from fine_grained_gaussian_process_forcasting_tpu.data import manifest
from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)


@pytest.fixture()
def solar_csv(tmp_path):
    frame = make_synthetic_frame("solar", num_entities=2,
                                 steps_per_entity=50, seed=0)
    path = tmp_path / "solar.csv"
    frame.to_csv(path, index=False)
    return str(path)


def test_expected_columns_match_formatter():
    cols = manifest.expected_columns("solar")
    assert "Power(MW)" in cols and "id" in cols
    # no-formatter experiments have no schema contract
    assert manifest.expected_columns("weather") == []


def test_verify_csv_passes_on_schema_match(solar_csv, tmp_path):
    store = str(tmp_path / "pins.json")
    report = manifest.verify_csv("solar", solar_csv, pin_store=store)
    assert report["columns_ok"] and len(report["sha256"]) == 64
    # trust-on-first-use: the first verified file captures its pin
    assert report["pin_origin"] == "captured_now"
    assert report["sha256_pinned"] == report["sha256"]


def test_verify_csv_trust_on_first_use_catches_drift(solar_csv, tmp_path):
    store = str(tmp_path / "pins.json")
    first = manifest.verify_csv("solar", solar_csv, pin_store=store)
    # unchanged file re-verifies against the captured pin
    again = manifest.verify_csv("solar", solar_csv, pin_store=store)
    assert again["pin_origin"] == "first_use_store"
    assert again["sha256_pinned"] == first["sha256"]
    # a drifted/tampered file is rejected from the second run on
    with open(solar_csv, "a") as f:
        f.write("\n")
    with pytest.raises(ValueError, match="differs from the previously"):
        manifest.verify_csv("solar", solar_csv, pin_store=store)


def test_verify_csv_rejects_missing_columns(tmp_path, solar_csv):
    import pandas as pd

    bad = pd.read_csv(solar_csv).drop(columns=["Power(MW)"])
    bad_path = tmp_path / "bad.csv"
    bad.to_csv(bad_path, index=False)
    with pytest.raises(ValueError, match=re.escape("Power(MW)")):
        manifest.verify_csv("solar", str(bad_path))


def test_verify_csv_rejects_checksum_mismatch(solar_csv, monkeypatch):
    monkeypatch.setitem(manifest.SHA256, "solar", "0" * 64)
    with pytest.raises(ValueError, match="sha256"):
        manifest.verify_csv("solar", solar_csv)


def test_install_local_csv_via_download_cli(solar_csv, tmp_path):
    from fine_grained_gaussian_process_forcasting_tpu.data.download import main

    out = main(["--expt_name", "solar", "--from_local_csv", solar_csv,
                "--output_folder", str(tmp_path / "root")])
    assert os.path.exists(out)
    assert pd.read_csv(out).shape[0] > 0  # file readable, non-empty
    # installed under the experiment layout
    assert out.endswith(os.path.join("solar", "solar.csv"))

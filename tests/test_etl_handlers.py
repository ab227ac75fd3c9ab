"""Offline execution of every L0 download/ETL handler.

The live endpoints are unreachable here (zero egress), so each handler
runs against a local schema replica of its real endpoint — the same file
layouts, separators, index formats, and quirk surfaces the reference's
``data_loader.py:97-917`` consumed — served through ``file://`` URLs.
This converts the handlers from "written to the documented schema" to
"executed against the documented schema": any parsing/layout drift in the
handler itself now fails a test (endpoint-side drift still needs egress).

Where a formatter exists, the produced csv is checked against the
formatter's column definition — the actual downstream contract.
"""

import gzip
import os
import zipfile

import numpy as np
import pandas as pd
import pytest

from fine_grained_gaussian_process_forcasting_tpu.data import download as dl
from fine_grained_gaussian_process_forcasting_tpu.data.experiment import (
    ExperimentConfig,
)


def _config(exp, tmp_path):
    return ExperimentConfig(24, exp, root_folder=str(tmp_path))


def _file_url(path) -> str:
    return "file://" + str(path)


def _zip_of(zip_path, files: dict) -> str:
    """files: archive-relative name -> text content."""
    with zipfile.ZipFile(zip_path, "w") as zf:
        for name, content in files.items():
            zf.writestr(name, content)
    return str(zip_path)


def _formatter_columns(exp) -> set:
    config = ExperimentConfig(24, exp, root_folder=".")
    fmt = config.make_data_formatter()
    return {c[0] for c in fmt.get_experiment_params()["column_definition"]}


def _check_formatter_contract(exp, csv_path):
    out = pd.read_csv(csv_path)
    need = _formatter_columns(exp)
    # formatters address columns by name: every named column must exist
    missing = {c for c in need if c not in set(out.columns)}
    assert not missing, f"{exp}: handler output missing {missing}"
    assert len(out) > 0
    return out


def test_solar_handler(tmp_path, monkeypatch):
    """NREL AL-PV zip: per-plant 5-min csvs named
    Actual_<lat>_<lon>_<year>_<tech>_<cap>_5_Min.csv."""
    idx = pd.date_range("2006-01-01", periods=24 * 12, freq="5min")
    body = pd.DataFrame(
        {"Power(MW)": np.abs(np.sin(np.arange(len(idx)) / 40.0))}, index=idx
    ).to_csv(index_label="LocalTime")
    src = _zip_of(tmp_path / "src.zip", {
        "Actual_30.55_-88.15_2006_DPV_38MW_5_Min.csv": body,
        "Actual_31.95_-87.25_2006_UPV_70MW_5_Min.csv": body,
    })
    monkeypatch.setitem(dl._URLS, "solar", _file_url(src))
    config = _config("solar", tmp_path)
    dl.download_solar(config)
    out = _check_formatter_contract("solar", config.data_csv_path)
    assert set(out["id"].unique()) == {"30.55_-88.15", "31.95_-87.25"}
    # 5-min -> hourly subsample
    assert (out.groupby("id").size() == 24).all()


def test_electricity_handler(tmp_path, monkeypatch):
    """UCI LD2011-2014: ';'-separated, ','-decimal, 15-min index; the
    handler's [1096, 1346) days_from_start window must survive."""
    early = pd.date_range("2011-01-01", periods=8, freq="15min")
    late = pd.date_range("2014-01-02", periods=24 * 4 * 3, freq="15min")
    idx = early.append(late)
    vals = np.round(np.random.default_rng(0).uniform(1, 5, (len(idx), 2)), 2)
    frame = pd.DataFrame(vals, index=idx, columns=["MT_001", "MT_002"])
    body = frame.to_csv(sep=";", decimal=",", index_label="")
    src = _zip_of(tmp_path / "src.zip", {"LD2011_2014.txt": body})
    monkeypatch.setitem(dl._URLS, "electricity", _file_url(src))
    config = _config("electricity", tmp_path)
    dl.download_electricity(config)
    out = _check_formatter_contract("electricity", config.data_csv_path)
    assert set(out["id"].unique()) == {"MT_001", "MT_002"}
    assert (out["days_from_start"] >= 1096).all()
    assert (out["days_from_start"] < 1346).all()


def test_traffic_handler(tmp_path, monkeypatch):
    """PEMS-SF custom matrix format: bracketed lists, ';'-separated rows,
    1-indexed randperm shuffle to invert."""
    def day(v):
        # 2 stations x 12 10-min samples (2 hours)
        rows = ";".join(
            "[" + " ".join(f"{v + 0.01 * i + 0.1 * s:.3f}" for i in range(12))
            + "]" for s in range(2))
        return f"[{rows}]"

    files = {
        "randperm": "[2 1 3]",
        "PEMS_trainlabels": "[1 2]",
        "PEMS_testlabels": "[3]",
        "PEMS_train": day(0.0) + "\n" + day(1.0) + "\n",
        "PEMS_test": day(2.0) + "\n",
        "stations_list": "[400001 400002]",
    }
    src = _zip_of(tmp_path / "src.zip", files)
    monkeypatch.setitem(dl._URLS, "traffic", _file_url(src))
    config = _config("traffic", tmp_path)
    dl.download_traffic(config)
    out = _check_formatter_contract("traffic", config.data_csv_path)
    assert set(out["id"].unique()) == {400001, 400002}
    # randperm unshuffle: day 0 in output order must be train line 2 (label 2)
    first = out.sort_values(["id", "sensor_day"]).groupby("id").first()
    assert (first["day_of_week"] == 2).all()


def test_air_quality_handler(tmp_path, monkeypatch):
    """Beijing PRSA: one csv per station inside a named folder."""
    def station(name):
        n = 48
        return pd.DataFrame({
            "No": np.arange(1, n + 1),
            "year": 2013, "month": 3, "day": np.repeat([1, 2], n // 2),
            "hour": list(range(24)) * (n // 24),
            "PM2.5": np.random.default_rng(0).uniform(1, 80, n).round(1),
            "NO2": 30.0, "CO": 0.8,
            "TEMP": 10.0, "PRES": 1010.0, "RAIN": 0.0,
            "station": name,
        }).to_csv(index=False)

    folder = "PRSA_Data_20130301-20170228"
    src = _zip_of(tmp_path / "src.zip", {
        f"{folder}/PRSA_Data_Dingling_20130301-20170228.csv":
            station("Dingling"),
        f"{folder}/PRSA_Data_Changping_20130301-20170228.csv":
            station("Changping"),
    })
    monkeypatch.setitem(dl._URLS, "air_quality", _file_url(src))
    config = _config("air_quality", tmp_path)
    dl.download_air_quality(config)
    out = _check_formatter_contract("air_quality", config.data_csv_path)
    assert set(out["id"].unique()) == {"Dingling", "Changping"}


def test_exchange_handler(tmp_path, monkeypatch):
    """LSTNet exchange_rate.txt.gz mirror: 8 headerless float columns."""
    arr = np.random.default_rng(1).uniform(0.5, 2.0, (40, 8)).round(6)
    gz_src = tmp_path / "exchange_rate.txt.gz"
    with gzip.open(gz_src, "wt") as f:
        for row in arr:
            f.write(",".join(f"{v}" for v in row) + "\n")
    monkeypatch.setitem(dl._URLS, "exchange", _file_url(gz_src))
    config = _config("exchange", tmp_path)
    dl.process_exchange(config,
                        source_csv=str(tmp_path / "definitely-missing.csv"))
    out = _check_formatter_contract("exchange", config.data_csv_path)
    assert len(out) == 40
    np.testing.assert_allclose(out["OT"].values, arr[:, -1], rtol=1e-6)


def test_watershed_handler(tmp_path):
    """Per-site WQual Level4 csvs placed in the data folder (manual)."""
    config = _config("watershed", tmp_path)
    sites = ["BDC", "BEF", "DCF", "GOF", "HBF", "LMP", "MCQ", "SBM", "TPB",
             "WHB"]
    idx = pd.date_range("2013-03-28", periods=64, freq="15min")
    for site in sites:
        pd.DataFrame({
            "Date": idx.astype(str),
            "Site": site,
            "TempC": np.random.default_rng(2).uniform(5, 15, 64).round(2),
            "Conductivity":
                np.random.default_rng(3).uniform(40, 90, 64).round(2),
            "Q": np.random.default_rng(3).uniform(1, 9, 64).round(2),
        }).to_csv(os.path.join(config.data_folder,
                               f"{site}_WQual_Level4.csv"))
    dl.process_watershed(config)
    out = _check_formatter_contract("watershed", config.data_csv_path)
    assert set(out["id"].unique()) == set(sites)
    # every 4th 15-min row -> hourly
    assert (out.groupby("id").size() == 16).all()


def test_covid_handler(tmp_path):
    """Oracle county cases joined with BTS Trips by Distance."""
    config = _config("covid", tmp_path)
    dates = pd.date_range("2020-03-01", periods=30, freq="1D")
    cases = pd.DataFrame({
        "REPORT_DATE": np.tile(dates.astype(str), 2),
        "COUNTY_FIPS_NUMBER": np.repeat([1001, 1003], len(dates)),
        "COUNTY_NAME": np.repeat(["Autauga", "Baldwin"], len(dates)),
        "PEOPLE_POSITIVE_NEW_CASES_COUNT": np.arange(2 * len(dates)),
        "PEOPLE_DEATH_COUNT": np.arange(2 * len(dates)) // 10,
    })
    trips = pd.DataFrame({
        "Date": np.tile(dates.astype(str), 2),
        "County FIPS": np.repeat([1001, 1003], len(dates)),
        "Number of Trips": 1000.0,
        "Population Staying at Home": 500.0,
        "Population Not Staying at Home": 700.0,
    })
    cases_csv = tmp_path / "covid-data.csv"
    trips_csv = tmp_path / "Trips_by_Distance.csv"
    cases.to_csv(cases_csv, index=False)
    trips.to_csv(trips_csv, index=False)
    dl.process_covid(config, cases_csv=str(cases_csv),
                     trips_csv=str(trips_csv))
    out = _check_formatter_contract("covid", config.data_csv_path)
    assert set(out["id"].unique()) == {1001, 1003}
    assert (out["Number of Trips"] == 1000.0).all()

    # the manual-download error must name both sources
    with pytest.raises(FileNotFoundError, match="Trips by Distance"):
        dl.process_covid(config, cases_csv=str(cases_csv),
                         trips_csv=str(tmp_path / "missing.csv"))


def test_weather_handler(tmp_path, monkeypatch):
    """BGC-Jena roof: half-year zips, DD.MM.YYYY timestamps, 10-min."""
    def half(start):
        # span past day 12 of the month: DD.MM.YYYY inference locks onto
        # %m.%d and raises at day 13 unless the handler pins the format
        idx = pd.date_range(start, periods=80, freq="6h")
        n = len(idx)
        return pd.DataFrame({
            "p (mbar)": 996.5, "T (degC)":
                np.random.default_rng(4).uniform(-5, 5, n).round(2),
            "rh (%)": 75.0,
        }, index=idx.strftime("%d.%m.%Y %H:%M:%S")).to_csv(
            index_label="Date Time")

    stems = ["mpi_roof_2008a", "mpi_roof_2008b"]
    monkeypatch.setattr(dl, "_WEATHER_STEMS", stems)
    starts = {"mpi_roof_2008a": "2008-01-01", "mpi_roof_2008b": "2008-07-01"}
    for stem in stems:
        src = _zip_of(tmp_path / f"{stem}_src.zip",
                      {f"{stem}.csv": half(starts[stem])})
        monkeypatch.setattr(
            dl, "_WEATHER_URL", _file_url(tmp_path) + "/{stem}_src.zip")
    config = _config("weather", tmp_path)
    dl.download_weather(config)
    out = pd.read_csv(config.data_csv_path)
    for col in ("T (degC)", "id", "categorical_id", "day_of_week",
                "days_from_start"):
        assert col in out.columns
    assert len(out) > 0


def test_ettm2_handler(tmp_path):
    """ETTm2: plain csv (pre-placed file short-circuits the download —
    also covers the reference's path bug fix, data_loader.py:265-296)."""
    config = _config("ETTm2", tmp_path)
    idx = pd.date_range("2016-07-01", periods=96, freq="15min")
    pd.DataFrame({
        "HUFL": 5.0, "HULL": 2.0, "MUFL": 1.0, "MULL": 0.5,
        "LUFL": 4.0, "LULL": 1.2,
        "OT": np.random.default_rng(5).uniform(20, 40, 96).round(3),
    }, index=idx).to_csv(os.path.join(config.data_folder, "ETT_raw.csv"),
                         index_label="date")
    dl.download_ett(config)
    out = pd.read_csv(config.data_csv_path)
    for col in ("OT", "id", "categorical_id", "days_from_start"):
        assert col in out.columns
    assert len(out) == 96


def test_camel_handler(tmp_path, monkeypatch):
    """CAMELS: per-basin whitespace streamflow text, -999.00 sentinels,
    trailing qc flag column."""
    def basin(gauge, flows):
        return "\n".join(
            f"{gauge} 1980 01 {d + 1:02d} {f} A"
            for d, f in enumerate(flows)) + "\n"

    root = "basin_dataset_public_v1p2/usgs_streamflow"
    src = _zip_of(tmp_path / "src.zip", {
        f"{root}/01/01013500_streamflow_qc.txt":
            basin("01013500", ["200.00", "-999.00", "210.00", "190.00"]),
        f"{root}/02/02177000_streamflow_qc.txt":
            basin("02177000", ["55.00", "60.00", "52.00", "58.00"]),
    })
    monkeypatch.setitem(dl._URLS, "camel", _file_url(src))
    config = _config("camel", tmp_path)
    dl.download_camel(config)
    out = pd.read_csv(config.data_csv_path)
    assert set(out["id"].astype(str).str.zfill(8)) == {"01013500", "02177000"}
    # the -999.00 sentinel row must not survive as a value
    flows = out["streamflow"].astype(float)
    assert not (flows == -999.0).any()


def test_favorita_handler(tmp_path):
    """Kaggle favorita archive: joined star schema from 6 csvs."""
    config = _config("favorita", tmp_path)
    dates = pd.date_range("2015-02-01", periods=20, freq="1D")
    train = pd.DataFrame({
        "id": np.arange(2 * len(dates)),
        "date": np.tile(dates.astype(str), 2),
        "store_nbr": np.repeat([1, 2], len(dates)),
        "item_nbr": np.repeat([100, 200], len(dates)),
        "unit_sales": np.random.default_rng(6).uniform(1, 9,
                                                       2 * len(dates)).round(2),
        "onpromotion": False,
    }).set_index("id")
    stores = pd.DataFrame({
        "store_nbr": [1, 2], "city": ["Quito", "Cuenca"],
        "state": ["Pichincha", "Azuay"], "type": ["A", "B"],
        "cluster": [1, 2],
    }).set_index("store_nbr")
    items = pd.DataFrame({
        "item_nbr": [100, 200], "family": ["GROCERY I", "DAIRY"],
        "class": [1000, 2000], "perishable": [0, 1],
    }).set_index("item_nbr")
    oil = pd.DataFrame({
        "date": dates.astype(str), "dcoilwtico": 50.0}).set_index("date")
    holidays = pd.DataFrame({
        "date": [str(dates[3].date())], "type": ["Holiday"],
        "locale": ["National"], "locale_name": ["Ecuador"],
        "description": ["Carnaval"], "transferred": [False],
    })
    transactions = pd.DataFrame({
        "date": np.tile(dates.astype(str), 2),
        "store_nbr": np.repeat([1, 2], len(dates)),
        "transactions": 1500,
    })
    _zip_of(tmp_path / "favorita" /
            "favorita-grocery-sales-forecasting.zip", {
                "train.csv": train.to_csv(),
                "stores.csv": stores.to_csv(),
                "items.csv": items.to_csv(),
                "oil.csv": oil.to_csv(index=True),
                "holidays_events.csv": holidays.to_csv(index=False),
                "transactions.csv": transactions.to_csv(index=False),
            })
    dl.process_favorita(config)
    out = pd.read_csv(config.data_csv_path)
    for col in ("log_sales", "traj_id", "oil", "transactions",
                "national_hol", "day_of_week"):
        assert col in out.columns
    assert set(out["traj_id"].dropna().unique()) == {"1_100", "2_200"}
    assert (out["national_hol"] == "Carnaval").sum() > 0

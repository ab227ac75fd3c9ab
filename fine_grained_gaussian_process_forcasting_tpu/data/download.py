"""Dataset acquisition / ETL to csv (L0 of the layer map).

Re-design of the reference's download pipeline (``data_loader.py:97-917``):
per-dataset download + resample + calendar-feature synthesis, writing the
csv each formatter consumes.  urllib + zipfile replace the wget/pyunpack
dependencies.  In offline environments use ``--synthetic`` (backed by
``data.synthetic``) or place the raw files manually and run with
``--skip_download``.

CLI:  python -m fine_grained_gaussian_process_forcasting_tpu.data.download \
          --expt_name solar [--output_folder .] [--synthetic]
"""

from __future__ import annotations

import argparse
import os
import urllib.request
import zipfile

import numpy as np
import pandas as pd

from fine_grained_gaussian_process_forcasting_tpu.data.experiment import (
    ExperimentConfig,
)

_URLS = {
    "solar": "https://www.nrel.gov/grid/assets/downloads/al-pv-2006.zip",
    "electricity": (
        "https://archive.ics.uci.edu/ml/machine-learning-databases/00321/"
        "LD2011_2014.txt.zip"
    ),
    "traffic": (
        "https://archive.ics.uci.edu/ml/machine-learning-databases/00204/"
        "PEMS-SF.zip"
    ),
    "air_quality": (
        "https://archive.ics.uci.edu/ml/machine-learning-databases/00501/"
        "PRSA2017_Data_20130301-20170228.zip"
    ),
    "ETTm2": (
        "https://github.com/zhouhaoyi/ETDataset/raw/main/ETT-small/ETTm2.csv"
    ),
    "camel": (
        "https://ral.ucar.edu/sites/default/files/public/product-tool/"
        "camels-catchment-attributes-and-meteorology-for-large-sample-"
        "studies-dataset-downloads/basin_timeseries_v1p2_metForcing_obsFlow.zip"
    ),
    # canonical public mirror of the LSTNet exchange-rate data (the
    # reference expects a manually downloaded ~/Downloads/exchange_rate.csv)
    "exchange": (
        "https://raw.githubusercontent.com/laiguokun/"
        "multivariate-time-series-data/master/exchange_rate/"
        "exchange_rate.txt.gz"
    ),
}

# the bgc-jena weather archive is split into half-year zips
_WEATHER_STEMS = [
    f"mpi_roof_{year}{half}" for year in range(2008, 2022) for half in "ab"
] + ["mpi_roof"]
_WEATHER_URL = "https://www.bgc-jena.mpg.de/wetter/{stem}.zip"


def download_and_unzip(url: str, zip_path: str, unzip_dir: str) -> None:
    if not os.path.exists(zip_path):
        print(f"Pulling data from {url} to {zip_path}")
        urllib.request.urlretrieve(url, zip_path)
    os.makedirs(unzip_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(unzip_dir)


def _add_calendar(df: pd.DataFrame, earliest_time) -> pd.DataFrame:
    date = df.index
    df["day_of_week"] = date.dayofweek
    df["hour"] = date.hour
    df["hours_from_start"] = (
        (date - earliest_time).seconds / 60 / 60
        + (date - earliest_time).days * 24
    )
    df["days_from_start"] = (date - earliest_time).days
    return df


def download_solar(config: ExperimentConfig) -> None:
    """NREL AL 2006 PV plants, hourly subsampled (``data_loader.py:463-501``)."""
    csv_dir = os.path.join(config.data_folder, "al-pv-2006")
    download_and_unzip(_URLS["solar"], csv_dir + ".zip", csv_dir)

    df_list = []
    for file in os.listdir(csv_dir):
        parts = file.split("_")
        df = pd.read_csv(os.path.join(csv_dir, file), index_col=0, sep=",")
        df_sub = df.iloc[0::12, :].copy()  # 5-min -> hourly
        df_sub["latitude"] = parts[1]
        df_sub["longtitude"] = parts[2]
        df_sub["id"] = parts[1] + "_" + parts[2]
        df_sub["capacity"] = parts[5]
        df_list.append(df_sub)

    output = pd.concat(df_list, axis=0)
    output.index = pd.to_datetime(output.index)
    output.sort_index(inplace=True)
    output = _add_calendar(output, output.index.min())
    output["categorical_id"] = output["id"]
    output.to_csv(config.data_csv_path)


def download_electricity(config: ExperimentConfig) -> None:
    """UCI LD2011-2014, hourly aggregation + per-meter active ranges
    (``data_loader.py:504-566``)."""
    csv_path = os.path.join(config.data_folder, "LD2011_2014.txt")
    download_and_unzip(_URLS["electricity"], csv_path + ".zip",
                       config.data_folder)

    df = pd.read_csv(csv_path, index_col=0, sep=";", decimal=",")
    df.index = pd.to_datetime(df.index)
    df.sort_index(inplace=True)
    output = df.resample("1h").mean().replace(0.0, np.nan)
    earliest_time = output.index.min()

    df_list = []
    for label in output:
        srs = output[label]
        start_date = min(srs.ffill().dropna().index)
        end_date = max(srs.bfill().dropna().index)
        active = (srs.index >= start_date) & (srs.index <= end_date)
        srs = srs[active].fillna(0.0)
        tmp = pd.DataFrame({"power_usage": srs})
        tmp = _add_calendar(tmp, earliest_time)
        tmp["categorical_id"] = label
        tmp["id"] = label
        df_list.append(tmp)

    output = pd.concat(df_list, axis=0).reset_index(drop=True)
    output = output[
        (output["days_from_start"] >= 1096) & (output["days_from_start"] < 1346)
    ].copy()
    output.to_csv(config.data_csv_path)


def download_traffic(config: ExperimentConfig) -> None:
    """PEMS-SF: parse the custom matrix format, unshuffle, hourly-average,
    flatten per sensor (``data_loader.py:568-720``)."""
    unzip_dir = os.path.join(config.data_folder, "pems")
    download_and_unzip(_URLS["traffic"], unzip_dir + ".zip", unzip_dir)

    def parse_list(line, typ=int, delim=None):
        return [typ(i) for i in
                line.replace("[", "").replace("]", "").split(delim)]

    def read_list(name):
        with open(os.path.join(unzip_dir, name)) as f:
            return parse_list(f.readlines()[0])

    def read_matrix(name):
        out = []
        with open(os.path.join(unzip_dir, name)) as f:
            for line in f.readlines():
                out.append([
                    parse_list(row, float)
                    for row in parse_list(line, str, ";")
                ])
        return out

    shuffle_order = np.array(read_list("randperm")) - 1
    day_of_week = np.array(
        read_list("PEMS_trainlabels") + read_list("PEMS_testlabels"))
    tensor = np.array(read_matrix("PEMS_train") + read_matrix("PEMS_test"))
    inverse = np.argsort(shuffle_order)
    day_of_week = day_of_week[inverse]
    tensor = tensor[inverse]

    labels = [f"traj_{i}" for i in read_list("stations_list")]
    hourly_list = []
    for day, day_matrix in enumerate(tensor):
        hourly = pd.DataFrame(day_matrix.T, columns=labels)
        hourly["hour_on_day"] = hourly.index // 6  # 10-min samples
        hourly = hourly.groupby("hour_on_day", as_index=True).mean()[labels]
        hourly["sensor_day"] = day
        hourly["time_on_day"] = hourly.index
        hourly["day_of_week"] = day_of_week[day]
        hourly_list.append(hourly)
    hourly_frame = pd.concat(hourly_list, axis=0, ignore_index=True)

    store_columns = [c for c in hourly_frame.columns if "traj" in c]
    other_columns = [c for c in hourly_frame.columns if "traj" not in c]
    slices = []
    for store in store_columns:
        sliced = hourly_frame[[store] + other_columns].copy()
        sliced.columns = ["values"] + other_columns
        sliced["id"] = int(store.replace("traj_", ""))
        sliced = sliced.sort_values(["id", "sensor_day", "time_on_day"])
        sliced["values"] = sliced["values"].ffill()
        slices.append(sliced.dropna())
    flat_df = pd.concat(slices, ignore_index=True)
    flat_df = flat_df[flat_df["sensor_day"] < 173].copy()
    flat_df["categorical_id"] = flat_df["id"]
    flat_df["hours_from_start"] = (
        flat_df["time_on_day"] + flat_df["sensor_day"] * 24.0)
    flat_df.to_csv(config.data_csv_path)


def download_air_quality(config: ExperimentConfig) -> None:
    """Beijing PRSA multi-site air quality (``data_loader.py:345-385``)."""
    unzip_dir = os.path.join(config.data_folder, "prsa")
    download_and_unzip(_URLS["air_quality"], unzip_dir + ".zip", unzip_dir)
    folder = os.path.join(unzip_dir, "PRSA_Data_20130301-20170228")
    df_list = [
        pd.read_csv(os.path.join(folder, f), index_col=0, sep=",")
        for f in os.listdir(folder)
    ]
    output = pd.concat(df_list, axis=0)
    output.index = pd.to_datetime(output[["year", "month", "day"]])
    output.sort_index(inplace=True)
    output = output.fillna(0.0)
    output = _add_calendar(output, output.index.min())
    output["id"] = output["station"]
    output["categorical_id"] = output["station"]
    output.to_csv(config.data_csv_path)


def process_exchange(config: ExperimentConfig,
                     source_csv: str = "~/Downloads/exchange_rate.csv") -> None:
    """Exchange-rate csv to daily frame (``data_loader.py:443-460``).

    The reference expects a manually downloaded csv; when it is absent
    this pulls the canonical LSTNet ``exchange_rate.txt.gz`` mirror and
    names the 8 series the standard way (columns 0-6 + OT)."""
    expanded = os.path.expanduser(source_csv)
    if os.path.exists(expanded):
        exchange = pd.read_csv(expanded)
    else:
        gz_path = os.path.join(config.data_folder, "exchange_rate.txt.gz")
        print(f"{expanded} not found; pulling {_URLS['exchange']}")
        urllib.request.urlretrieve(_URLS["exchange"], gz_path)
        exchange = pd.read_csv(gz_path, compression="gzip", header=None)
        exchange.columns = [str(i) for i in range(7)] + ["OT"]
    start_date = pd.to_datetime("1990-01-01")
    exchange.index = pd.date_range(start=start_date, periods=len(exchange))
    exchange.sort_index(inplace=True)
    exchange = _add_calendar(exchange, exchange.index.min())
    exchange["categorical_id"] = 1
    exchange["id"] = 1
    exchange.to_csv(config.data_csv_path)


def process_watershed(config: ExperimentConfig) -> None:
    """Water-quality per-site csvs (``data_loader.py:137-176``)."""
    sites = ["BDC", "BEF", "DCF", "GOF", "HBF", "LMP", "MCQ", "SBM", "TPB",
             "WHB"]
    df_list = []
    for site in sites:
        df = pd.read_csv(
            os.path.join(config.data_folder, f"{site}_WQual_Level4.csv"),
            index_col=0, sep=",")
        df_list.append(df.iloc[0::4, :])
    output = pd.concat(df_list, axis=0)
    output.index = pd.to_datetime(output.Date)
    output.sort_index(inplace=True)
    output = output.dropna(axis=1, how="all").ffill().bfill()
    start_date = pd.to_datetime("2013-03-28")
    output = output[output.index >= start_date]
    output = _add_calendar(output, start_date)
    output["id"] = output["Site"]
    output["categorical_id"] = output["Site"]
    output = output[output["Site"] != 0.0].fillna("na")
    output.to_csv(config.data_csv_path)


def process_covid(config: ExperimentConfig,
                  cases_csv: str = "~/Downloads/covid-data.csv",
                  trips_csv: str = "~/Downloads/Trips_by_Distance.csv") -> None:
    """Covid cases joined with travel data (``data_loader.py:388-439``).

    Both sources require interactive portals (Oracle county case data and
    the BTS "Trips by Distance" download), so — like the reference — they
    must be pre-downloaded; a clear error names them."""
    for path, what in ((cases_csv, "county covid case data (Oracle/HHS "
                        "county dataset, REPORT_DATE/COUNTY_FIPS_NUMBER "
                        "schema)"),
                       (trips_csv, "BTS 'Trips by Distance' export "
                        "(https://data.bts.gov/Research-and-Statistics/"
                        "Trips-by-Distance/w96p-f2qv)")):
        if not os.path.exists(os.path.expanduser(path)):
            raise FileNotFoundError(
                f"{path} not found — place the {what} there; these portals "
                "need interactive downloads, matching the reference's "
                "manual-download workflow (data_loader.py:390-395)."
            )
    df = pd.read_csv(cases_csv, dtype={"COUNTY_NAME": str})
    df_travel = pd.read_csv(trips_csv)
    df.index = pd.to_datetime(df.REPORT_DATE)
    df_travel.index = pd.to_datetime(df_travel.Date)
    df.sort_index(inplace=True)
    df_travel.sort_index(inplace=True)
    df = df.dropna()
    df_travel = df_travel.dropna()
    earliest, latest = df.index.min(), df_travel.index.max()
    df = df[(df.index >= earliest) & (df.index <= latest)]
    df_travel = df_travel[(df_travel.index >= earliest)
                          & (df_travel.index <= latest)]
    df["day_of_week"] = df.index.dayofweek
    df["id"] = df["COUNTY_FIPS_NUMBER"].astype(int)
    df["categorical_id"] = df["id"]
    df["days_from_start"] = (df.index - earliest).days
    frames = []
    for fip, dff in df.groupby("COUNTY_FIPS_NUMBER"):
        tmp = df_travel.loc[df_travel["County FIPS"].astype(int) == int(fip)]
        dff = dff.copy()
        n = min(len(tmp), len(dff))
        for col in ("Number of Trips", "Population Staying at Home",
                    "Population Not Staying at Home"):
            vals = np.zeros(len(dff))
            vals[:n] = tmp[col].values[:n]
            dff[col] = vals
        frames.append(dff)
    pd.concat(frames, axis=0).fillna(0).to_csv(config.data_csv_path)


def _activity_window(output: pd.DataFrame) -> pd.DataFrame:
    """Trim to the [first-ffill-valid, last-bfill-valid] index range and
    zero-fill, the reference's active-range recipe
    (``data_loader.py:247-253``)."""
    start_date = min(output.ffill().dropna().index)
    end_date = max(output.bfill().dropna().index)
    active = (output.index >= start_date) & (output.index <= end_date)
    return output[active].fillna(0.0)


def download_weather(config: ExperimentConfig) -> None:
    """BGC-Jena roof weather 2008-2021, hourly means
    (``data_loader.py:179-262``)."""
    df_list = []
    for stem in _WEATHER_STEMS:
        csv_path = os.path.join(config.data_folder, f"{stem}.csv")
        download_and_unzip(_WEATHER_URL.format(stem=stem),
                           os.path.join(config.data_folder, f"{stem}.zip"),
                           config.data_folder)
        df_list.append(pd.read_csv(csv_path, index_col=0,
                                   encoding="unicode_escape"))

    output = pd.concat(df_list, axis=0, join="outer")
    # the archive's "Date Time" column is DD.MM.YYYY HH:MM:SS — inference
    # locks onto %m.%d for the first rows and raises at day >= 13
    try:
        output.index = pd.to_datetime(output.index,
                                      format="%d.%m.%Y %H:%M:%S")
    except ValueError:
        output.index = pd.to_datetime(output.index, dayfirst=True)
    output.sort_index(inplace=True)
    output = output.resample("1h").mean().replace(0.0, np.nan)
    earliest_time = output.index.min()
    output = _activity_window(output)
    output = _add_calendar(output, earliest_time)
    output["id"] = 1
    output["categorical_id"] = output["id"]
    output["days_from_start"] = (output.index - earliest_time).days
    output.to_csv(config.data_csv_path)


def download_ett(config: ExperimentConfig) -> None:
    """ETTm2 (electricity transformer temperature, 15-min) from the
    ETDataset repo (``data_loader.py:265-296``; the reference then reads
    ``os.path.join(<file>, "ETTm2.csv")`` — a path bug; the intended read
    of the downloaded csv is implemented)."""
    data_path = os.path.join(config.data_folder, "ETT_raw.csv")
    if not os.path.exists(data_path):
        print(f"Pulling data from {_URLS['ETTm2']} to {data_path}")
        urllib.request.urlretrieve(_URLS["ETTm2"], data_path)

    df = pd.read_csv(data_path, index_col=0)
    df.index = pd.to_datetime(df.index)
    df.sort_index(inplace=True)
    output = df.resample("15min").mean().replace(0.0, np.nan)
    earliest_time = output.index.min()
    output = _activity_window(output)
    output = _add_calendar(output, earliest_time)
    output["id"] = 1
    output["categorical_id"] = output["id"]
    output["days_from_start"] = (output.index - earliest_time).days
    output.to_csv(config.data_csv_path)


def download_camel(config: ExperimentConfig) -> None:
    """CAMELS USGS streamflow: parse the per-basin whitespace text files
    (``data_loader.py:299-342``)."""
    zip_path = os.path.join(
        config.data_folder, "basin_timeseries_v1p2_metForcing_obsFlow.zip")
    download_and_unzip(_URLS["camel"], zip_path, config.data_folder)
    flow_dir = os.path.join(config.data_folder, "basin_dataset_public_v1p2",
                            "usgs_streamflow")

    df_list = []
    for region in sorted(os.listdir(flow_dir)):
        region_dir = os.path.join(flow_dir, region)
        for fname in sorted(os.listdir(region_dir)):
            rows = []
            with open(os.path.join(region_dir, fname)) as f:
                for line in f:
                    vals = [v for v in line.rstrip("\n").split(" ") if v]
                    rows.append(vals)
            arr = np.asarray(rows)[:, :-1]
            df = pd.DataFrame({
                "date": [f"{a[1]}-{a[2]}-{a[3]}" for a in arr],
                "id": arr[:, 0],
                "streamflow": arr[:, -1],
            })
            df.index = pd.to_datetime(df.date)
            df.sort_index(inplace=True)
            df.loc[df["streamflow"] == "-999.00", "streamflow"] = np.nan
            df = _activity_window(df)
            earliest_time = df.index.min()
            df = _add_calendar(df, earliest_time)
            df["categorical_id"] = df["id"]
            df["days_from_start"] = (df.index - earliest_time).days
            df_list.append(df)

    output = pd.concat(df_list, axis=0, join="outer")
    output.sort_index(inplace=True)
    output.to_csv(config.data_csv_path)


def process_favorita(config: ExperimentConfig) -> None:
    """Favorita grocery sales (Kaggle competition data; manual download —
    ``data_loader.py:723-878``).  The raw archive holds 7z-compressed csvs;
    extraction uses py7zr or a system 7z when available."""
    kaggle_url = (
        "https://www.kaggle.com/c/favorita-grocery-sales-forecasting/data")
    data_folder = config.data_folder
    zip_file = os.path.join(data_folder,
                            "favorita-grocery-sales-forecasting.zip")
    if not os.path.exists(zip_file):
        raise FileNotFoundError(
            f"Favorita zip file not found at {zip_file}! Kaggle requires "
            f"authentication — download it manually from {kaggle_url} and "
            "place it there."
        )
    with zipfile.ZipFile(zip_file) as zf:
        zf.extractall(data_folder)

    import glob as _glob

    def un7z(path: str) -> None:
        try:
            import py7zr  # optional

            with py7zr.SevenZipFile(path) as zf7:
                zf7.extractall(data_folder)
            return
        except ImportError:
            pass
        import shutil as _shutil
        import subprocess as _sp

        for tool in ("7z", "7za"):
            if _shutil.which(tool):
                _sp.run([tool, "x", "-y", f"-o{data_folder}", path],
                        check=True, capture_output=True)
                return
        raise RuntimeError(
            f"cannot extract {path}: install py7zr or a system 7z binary")

    for f in _glob.glob(os.path.join(data_folder, "*.7z")):
        un7z(f)

    start_date = pd.Timestamp(2015, 1, 1)
    end_date = pd.Timestamp(2016, 6, 1)
    temporal = pd.read_csv(os.path.join(data_folder, "train.csv"),
                           index_col=0)
    store_info = pd.read_csv(os.path.join(data_folder, "stores.csv"),
                             index_col=0)
    oil = pd.read_csv(os.path.join(data_folder, "oil.csv"),
                      index_col=0).iloc[:, 0]
    holidays = pd.read_csv(os.path.join(data_folder, "holidays_events.csv"))
    items = pd.read_csv(os.path.join(data_folder, "items.csv"), index_col=0)
    transactions = pd.read_csv(os.path.join(data_folder, "transactions.csv"))

    temporal["date"] = pd.to_datetime(temporal["date"])
    temporal = temporal[(temporal["date"] >= start_date)
                        & (temporal["date"] < end_date)]
    dates = temporal["date"].unique()

    temporal["traj_id"] = (temporal["store_nbr"].apply(str) + "_"
                           + temporal["item_nbr"].apply(str))
    temporal["unique_id"] = (temporal["traj_id"] + "_"
                             + temporal["date"].apply(str))

    # drop trajectories with negative returns
    min_returns = temporal["unit_sales"].groupby(temporal["traj_id"]).min()
    valid_ids = set(min_returns[min_returns >= 0].index)
    temporal = temporal[temporal["traj_id"].isin(valid_ids)].copy()
    temporal["open"] = 1

    resampled = []
    for traj_id, raw_sub_df in temporal.groupby("traj_id"):
        sub_df = raw_sub_df.set_index("date", drop=True).copy()
        sub_df = sub_df.resample("1D").last()
        sub_df["date"] = sub_df.index
        cols = ["store_nbr", "item_nbr", "onpromotion"]
        sub_df[cols] = sub_df[cols].ffill()
        sub_df["open"] = sub_df["open"].fillna(0)
        sub_df["log_sales"] = np.log(sub_df["unit_sales"])
        resampled.append(sub_df.reset_index(drop=True))
    temporal = pd.concat(resampled, axis=0)

    oil.name = "oil"
    oil.index = pd.to_datetime(oil.index)
    temporal = temporal.join(oil.reindex(dates).ffill(), on="date",
                             how="left")
    temporal["oil"] = temporal["oil"].fillna(-1)
    temporal = temporal.join(store_info, on="store_nbr", how="left")
    temporal = temporal.join(items, on="item_nbr", how="left")
    transactions["date"] = pd.to_datetime(transactions["date"])
    temporal = temporal.merge(transactions, on=["date", "store_nbr"],
                              how="left")
    temporal["transactions"] = temporal["transactions"].fillna(-1)
    temporal["day_of_week"] = pd.to_datetime(
        temporal["date"].values).dayofweek
    temporal["day_of_month"] = pd.to_datetime(temporal["date"].values).day
    temporal["month"] = pd.to_datetime(temporal["date"].values).month

    hol = holidays[~holidays["transferred"]].copy()
    hol.columns = [c if c != "type" else "holiday_type" for c in hol.columns]
    hol["date"] = pd.to_datetime(hol["date"])
    for locale, left_on, right_on, out in (
        ("National", ["date"], ["date"], "national_hol"),
        ("Regional", ["state", "date"], ["locale_name", "date"],
         "regional_hol"),
        ("Local", ["city", "date"], ["locale_name", "date"], "local_hol"),
    ):
        subset = hol[hol["locale"] == locale]
        temporal[out] = temporal.merge(
            subset, left_on=left_on, right_on=right_on,
            how="left")["description"].fillna("")

    temporal.sort_values("unique_id", inplace=True)
    temporal.to_csv(config.data_csv_path)


DOWNLOAD_FUNCTIONS = {
    "electricity": download_electricity,
    "traffic": download_traffic,
    "air_quality": download_air_quality,
    "watershed": process_watershed,
    "solar": download_solar,
    "covid": process_covid,
    "exchange": process_exchange,
    "weather": download_weather,
    "ETTm2": download_ett,
    "camel": download_camel,
    "favorita": process_favorita,
}


def main(argv=None):
    parser = argparse.ArgumentParser(description="dataset download/ETL")
    parser.add_argument("--expt_name", type=str, required=True,
                        choices=sorted(DOWNLOAD_FUNCTIONS) + ["all"])
    parser.add_argument("--output_folder", type=str, default=".")
    parser.add_argument("--force_download", type=str, default="yes",
                        choices=["yes", "no"])
    parser.add_argument("--synthetic", action="store_true",
                        help="write a schema-matching synthetic csv instead "
                             "of downloading (offline environments)")
    parser.add_argument("--synthetic_noise", type=str, default="iid",
                        choices=["iid", "ar1", "gp"])
    parser.add_argument("--from_local_csv", type=str, default=None,
                        help="install a user-supplied processed csv "
                             "(schema+checksum verified via data.manifest) "
                             "instead of downloading — the offline bypass")
    args = parser.parse_args(argv)

    config = ExperimentConfig(experiment=args.expt_name,
                              root_folder=args.output_folder)
    if args.from_local_csv is not None:
        from fine_grained_gaussian_process_forcasting_tpu.data.manifest import (
            install_local_csv,
        )

        path = install_local_csv(args.expt_name, args.from_local_csv,
                                 root_folder=args.output_folder)
        print(f"Installed verified local csv at {path}")
        return path
    if os.path.exists(config.data_csv_path) and args.force_download == "no":
        print(f"Data already processed for {args.expt_name}; skipping.")
        return config.data_csv_path

    if args.synthetic:
        from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
            make_synthetic_frame,
        )

        frame = make_synthetic_frame(args.expt_name, num_entities=8,
                                     steps_per_entity=2000,
                                     noise=args.synthetic_noise)
        frame.to_csv(config.data_csv_path, index=False)
        print(f"Wrote synthetic {config.data_csv_path}")
        return config.data_csv_path

    try:
        DOWNLOAD_FUNCTIONS[args.expt_name](config)
    except urllib.error.URLError as e:
        raise SystemExit(
            f"download failed for {args.expt_name!r}: {e}. This environment "
            "appears to be offline — re-run with --synthetic for a "
            "schema-matching generated csv, or place the raw files manually."
        )
    print("Done.")
    return config.data_csv_path


if __name__ == "__main__":
    main()

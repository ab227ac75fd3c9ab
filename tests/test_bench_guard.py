"""bench.py wedged-tunnel insurance (NOTES.md "Gotchas": the axon tunnel can
drop an RPC and leave a client blocked forever).  The guard must (a) detect an
unresponsive device via a bounded subprocess probe and (b) re-emit the last
successful measurement explicitly flagged stale instead of hanging/printing
nothing for the driver."""

import contextlib
import importlib.util
import io
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def benchmod():
    spec = importlib.util.spec_from_file_location(
        "benchmod_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # top-level only; main() never runs
    return mod


def _capture_line(fn, *args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(*args)
    return json.loads(buf.getvalue())


def test_probe_times_out_cleanly(benchmod):
    # A timeout far below interpreter startup forces the wedged branch
    # without needing a wedged device.
    assert benchmod._device_responsive(timeout_s=0.05) is False


def test_stale_emission_reuses_last_good(benchmod, tmp_path, monkeypatch):
    last_good = tmp_path / "last_good.json"
    last_good.write_text(json.dumps({
        "metric": "train_steps_per_sec_AutoDG_b256",
        "value": 123.4, "unit": "steps/s", "vs_baseline": 10.0,
    }))
    monkeypatch.setattr(benchmod, "LAST_GOOD", str(last_good))
    out = _capture_line(benchmod._emit_stale, "tunnel wedged (test)")
    assert out["stale"] is True
    assert out["stale_reason"] == "tunnel wedged (test)"
    assert out["value"] == 123.4  # measurement preserved, only flagged


def test_stale_emission_without_cache_is_an_error_line(benchmod, tmp_path,
                                                       monkeypatch):
    monkeypatch.setattr(benchmod, "LAST_GOOD",
                        str(tmp_path / "missing.json"))
    out = _capture_line(benchmod._emit_stale, "no cache (test)")
    # value must be null (NOT 0.0) and the stale flag set uniformly, so a
    # driver parsing numeric fields first can't record a phantom 0-steps/s
    # regression (advisor r3)
    assert out["value"] is None
    assert out["stale"] is True
    assert out["error"] == "no cache (test)"


def test_committed_seed_is_a_full_measurement():
    # The committed seed guarantees a fresh checkout degrades to a real
    # (flagged) number, never a zero line.
    with open(os.path.join(REPO, ".bench_last_good.json")) as f:
        blob = json.load(f)
    assert blob["metric"] == "train_steps_per_sec_AutoDG_b256"
    assert blob["value"] > 0
    assert "stale" not in blob  # flag only ever added at emission time

"""Watchdog driver: restarts stalled commands, passes through success.

Children run with -S: this machine's sitecustomize preloads jax, making
bare interpreter startup slower than the test stall thresholds."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WATCHDOG = os.path.join(REPO, "scripts", "watchdog_run.py")


def _run(args):
    return subprocess.run([sys.executable, WATCHDOG] + args,
                          capture_output=True, text=True, timeout=120)


def test_watchdog_success_passthrough(tmp_path):
    log = str(tmp_path / "ok.log")
    r = _run(["--log", log, "--stall", "30", "--poll", "0.2", "--",
              sys.executable, "-S", "-c", "print('done')"])
    assert r.returncode == 0
    assert "done" in open(log).read()


def test_watchdog_kills_stalled_and_gives_up(tmp_path):
    log = str(tmp_path / "stall.log")
    r = _run(["--log", log, "--stall", "1", "--poll", "0.2", "--retries", "1",
              "--", sys.executable, "-S", "-c",
              "import time; time.sleep(600)"])
    assert r.returncode == 1
    assert r.stdout.count("stalled") == 2  # initial attempt + 1 retry


def test_watchdog_restart_until_success(tmp_path):
    """First attempt stalls, relaunch succeeds (marker-file state)."""
    log = str(tmp_path / "retry.log")
    marker = str(tmp_path / "marker")
    code = (f"import os, time, sys\n"
            f"if os.path.exists({marker!r}):\n"
            f"    print('recovered'); sys.exit(0)\n"
            f"open({marker!r}, 'w').close()\n"
            f"time.sleep(600)\n")
    r = _run(["--log", log, "--stall", "1", "--poll", "0.2", "--retries", "3",
              "--", sys.executable, "-S", "-c", code])
    assert r.returncode == 0
    assert "recovered" in open(log).read()

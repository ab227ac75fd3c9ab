"""Stall watchdog: run a command, restart it when its log stops growing.

The experimental 'axon' remote-TPU tunnel on this machine occasionally
drops an RPC response, leaving the client blocked on a futex forever (all
threads idle, device idle — observed twice during long studies).  The
harness's crash-safe study resume (``harness._save_study_state``) makes a
restart cheap: completed trials are skipped and the compilation cache
removes the recompile cost, so killing a wedged process and relaunching
loses at most the in-flight trial.

Usage:
    python scripts/watchdog_run.py --log out.log --stall 900 --retries 10 \
        -- python -m fine_grained_gaussian_process_forcasting_tpu.train.cli ...

Exits with the wrapped command's final return code.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--log", required=True)
    parser.add_argument("--stall", type=float, default=900.0,
                        help="seconds of no log growth before a restart "
                             "(must exceed the longest compile)")
    parser.add_argument("--retries", type=int, default=10)
    parser.add_argument("--poll", type=float, default=15.0)
    parser.add_argument("cmd", nargs=argparse.REMAINDER,
                        help="-- command to run")
    args = parser.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        parser.error("no command given (use -- cmd ...)")

    env = dict(os.environ)
    env["PYTHONFAULTHANDLER"] = "1"
    env.setdefault("PYTHONUNBUFFERED", "1")

    for attempt in range(args.retries + 1):
        with open(args.log, "ab") as logf:
            logf.write(f"\n--- watchdog attempt {attempt} ---\n".encode())
            logf.flush()
            proc = subprocess.Popen(cmd, stdout=logf, stderr=logf, env=env,
                                    start_new_session=True)
        last_size = -1
        last_change = time.time()
        while True:
            rc = proc.poll()
            if rc is not None:
                if rc == 0:
                    return 0
                print(f"watchdog: attempt {attempt} exited rc={rc}",
                      flush=True)
                break  # relaunch
            size = os.path.getsize(args.log)
            now = time.time()
            if size != last_size:
                last_size, last_change = size, now
            elif now - last_change > args.stall:
                print(f"watchdog: attempt {attempt} stalled "
                      f"{now - last_change:.0f}s — killing pg {proc.pid}",
                      flush=True)
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                break  # relaunch
            time.sleep(args.poll)
    print(f"watchdog: giving up after {args.retries + 1} attempts",
          flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())

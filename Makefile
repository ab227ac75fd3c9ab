# Test tiers (VERDICT r2 item 6): the fast contract suite yields a
# verdict in ~7 min on an otherwise-idle 1-CPU host (measured r5:
# 6m42s CPU / 15m wall at ~55% contention — budget 15-20 min wall when
# the host shares CPU with a training run); the slow tier adds the
# end-to-end training/parity runs.  `make test` runs everything.
.PHONY: test test-fast test-slow parity parity-dry

test-fast:
	python -m pytest tests/ -m "not slow" -x -q

test-slow:
	python -m pytest tests/ -m slow -x -q

test:
	python -m pytest tests/ -x -q

# Real-data parity (VERDICT r3 item 3): manifest-verify the csvs in
# $(CSV_DIR), run the BASELINE.md protocols (notebook 3-arm + AutoDG
# grid) and write PARITY_REAL.md with the 1% comparison.
parity:
	python scripts/parity_real.py --csv_dir $(CSV_DIR)

# Offline dry run (zero egress): same pipeline on synthetic stand-ins,
# tiny budget — proves the one-command on-ramp end to end.
parity-dry:
	python scripts/parity_real.py --synthetic --quick --n_seeds 1 \
	  --horizons 24 --datasets solar,electricity

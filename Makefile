# Test tiers (VERDICT r2 item 6): the fast contract suite must yield a
# verdict in <5 min on a 1-CPU host; the slow tier adds the end-to-end
# training/parity runs.  `make test` runs everything.
.PHONY: test test-fast test-slow

test-fast:
	python -m pytest tests/ -m "not slow" -x -q

test-slow:
	python -m pytest tests/ -m slow -x -q

test:
	python -m pytest tests/ -x -q

# Developer workflow (role of the reference Makefile:36-64)
PYTHON ?= python

.PHONY: test unittest unittest-fast envtest suite bench clean format

test: unittest

# fast tier: <5 min on a 1-core host — compile-heavy files are marked slow
unittest-fast:
	$(PYTHON) -m pytest tests/ -q -m "not slow"

unittest:
	$(PYTHON) -m pytest tests/ -q -m "not envtest"

envtest:
	$(PYTHON) -m pytest tests/ -q -m envtest

all-tests:
	$(PYTHON) -m pytest tests/ -q

# full suite, one pytest process per file: a single long-lived process
# intermittently SIGABRTs in the XLA-CPU compile path on this host
suite:
	bash scripts/run_suite.sh

# slow tier only, per-file processes (XLA:CPU segfaults after ~110
# compile-heavy tests in one process — see scripts/run_slow_suite.sh)
slowtest:
	bash scripts/run_slow_suite.sh

bench:
	$(PYTHON) bench.py

baseline:
	$(PYTHON) scripts/measure_reference_baseline.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -rf .pytest_cache build dist *.egg-info

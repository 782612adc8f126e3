# Developer workflow (role of the reference Makefile:36-64)
PYTHON ?= python

.PHONY: test unittest envtest bench clean format

test: unittest

unittest:
	$(PYTHON) -m pytest tests/ -q -m "not envtest"

envtest:
	$(PYTHON) -m pytest tests/ -q -m envtest

all-tests:
	$(PYTHON) -m pytest tests/ -q

bench:
	$(PYTHON) bench.py

baseline:
	$(PYTHON) scripts/measure_reference_baseline.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -rf .pytest_cache build dist *.egg-info

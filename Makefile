# Developer entry points (reference parity: Makefile:1-40, minus Docker —
# the TPU build runs directly on the host attached to the chip).

PYTHON ?= python

.PHONY: test test-heavy test-all lint stage-example-data build-index train-model \
        generate-predictions closest-search get-predictions-accuracy bench

# Test lanes (measured on the 8-CPU virtual mesh, late r5):
#   make test      fast lane, ~159 s  (115 tests; skips `heavy` and `slow`)
#   heavy lane     10 compile-bound integration tests (~310 s when it held 5;
#                                      round-5 additions roughly double that)
#   slow lane      >10 min            (2 full CPU train→predict example-dataset
#                                      parity runs — nightly material; the TPU
#                                      PARITY.json run covers the same path)
# `make test-all` runs all three.
test:
	$(PYTHON) -m pytest tests/ -q -m 'not slow and not heavy'

test-heavy:
	$(PYTHON) -m pytest tests/ -q -m 'heavy'

test-all:
	$(PYTHON) -m pytest tests/ -q -m ''

lint:
	$(PYTHON) scripts/lint.py

# tests under coverage (reference setup.cfg always-on --cov; opt-in here so
# the plain `make test` loop stays fast).  Requires `coverage` (not in the
# hermetic dev image — degrades to plain pytest with a notice).
test-cov:
	@$(PYTHON) -c "import coverage" 2>/dev/null \
	  && { $(PYTHON) -m coverage run -m pytest tests/ -q && $(PYTHON) -m coverage report; } \
	  || { echo "coverage not installed; running plain pytest"; $(PYTHON) -m pytest tests/ -q; }

# full train -> predict -> accuracy on the reference example dataset;
# asserts custom error <= 700 and writes PARITY.json (reproducible parity)
example-parity:
	$(PYTHON) scripts/example_parity.py

stage-example-data:
	$(PYTHON) -m doppelspeller_tpu.cli stage-example-data-set

build-index:
	$(PYTHON) -m doppelspeller_tpu.cli -vv build-index

train-model:
	$(PYTHON) -m doppelspeller_tpu.cli -vv train-model

generate-predictions:
	$(PYTHON) -m doppelspeller_tpu.cli -vv generate-predictions

# usage: make closest-search title="SOME TITLE"
closest-search:
	$(PYTHON) -m doppelspeller_tpu.cli -vv closest-search-single-title -t "$(title)"

get-predictions-accuracy:
	$(PYTHON) -m doppelspeller_tpu.cli -vv get-predictions-accuracy

bench:
	$(PYTHON) bench.py

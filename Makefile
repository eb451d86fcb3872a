# Round routine (VERDICT r3 #8: the medium/slow tiers must run every round,
# not just the default tier). Run ledgering is UNCONDITIONAL and lives in
# the tools themselves (r8 #3 / r10): tests/conftest.py appends every pytest
# outcome to TESTRUNS.jsonl, bench.py / tools/check_new.py /
# tools/driver_sim.py append their own — no wrapper to bypass.

PY ?= python

.PHONY: test test-full bench sweep verify

test:        ## default tier (fast; runs in CI-style loops)
	$(PY) -m pytest tests/ -q

test-full:   ## medium+slow tiers: RocksDB parity, streaming equivalence, scaling probes
	$(PY) -m pytest tests/ -q -m "medium or slow" -p no:cacheprovider

bench:       ## headline timings at $$SPARK_GRAFT_SF_DIR (default sf0.1)
	$(PY) bench.py

sweep:       ## full driver-contract simulation (every query vs its oracle at sf0.01)
	$(PY) tools/driver_sim.py

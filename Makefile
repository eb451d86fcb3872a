
# Round routine (VERDICT r3 #8: the medium/slow tiers must run every round,
# not just the default tier). Each target appends a one-line JSON record to
# TESTRUNS.jsonl so tier-rot is visible in-repo.

PY ?= python

.PHONY: test test-full bench verify

test:        ## default tier (fast; runs in CI-style loops)
	$(PY) -m pytest tests/ -q

test-full:   ## medium+slow tiers: RocksDB parity, streaming equivalence, scaling probes
	$(PY) -m pytest tests/ -q -m "medium or slow" -p no:cacheprovider 2>&1 | tail -2 | \
	  $(PY) -c "import sys,json,time; out=sys.stdin.read(); print(json.dumps({'ts': time.time(), 'kind': 'pytest-full-tier', 'tail': out.strip().splitlines()[-1] if out.strip() else ''}))" >> TESTRUNS.jsonl
	tail -1 TESTRUNS.jsonl

bench:       ## headline timings at $$SPARK_GRAFT_SF_DIR (default sf0.1)
	$(PY) bench.py

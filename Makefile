# Round lifecycle targets.
#
# round-start MUST be the first command of every round: the driver lands
# CORRECTNESS_r{N}.json AFTER the round-{N} snapshot is taken, so the README
# evidence ledger is stale by exactly one artifact at every round boundary.
# Regenerating it here keeps tests/test_evidence_ledger.py green from turn 0.

.PHONY: round-start test verify-local bench prices

round-start:
	python tools/evidence_ledger.py
	-python tools/bench_adjudicate.py
	python -m pytest tests/test_evidence_ledger.py tests/test_registry_parity.py -q

test:
	python -m pytest tests/ -x -q

# Full-registry DuckDB oracle sweep at one SF (pass SF_DIR/OUT to override).
SF_DIR ?= /root/testdata/sf0.01
OUT ?= VERIFY_LOCAL_local.json
verify-local:
	python tools/verify_local.py --sf-dir $(SF_DIR) --out $(OUT)

bench:
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py

prices:
	python tools/price_all.py

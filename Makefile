# Round gate: run BOTH official signals locally before committing a round.
# `make check` is the pre-commit guard the round-4 fixture drift showed we
# need — it runs every registered query against its DuckDB oracle (the same
# comparison the driver samples) and the full test suite, and exits non-zero
# on any failure.

.PHONY: check correctness test bench

check: correctness test

correctness:
	python scripts/check_correctness.py

test:
	python -m pytest tests/ -q

bench:
	python bench.py

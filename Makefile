# Convenience targets — everything is plain Python, no build step.

.PHONY: test oracle-all bench scaling

test:
	python -m pytest tests/ -x -q

# Full-registry oracle gate: run EVERY queries() entry against its DuckDB
# oracle at sf0.01 and fail on any mismatch (the driver only samples ~50).
oracle-all:
	SWARM_ORACLE_ALL=1 python -m pytest tests/test_oracle_all.py -q

bench:
	python bench.py

scaling:
	python bench.py --scaling

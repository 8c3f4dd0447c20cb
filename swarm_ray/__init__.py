"""swarm_ray — a Ray-Data-native parse → enrich → route → aggregate engine.

A from-scratch rebuild of the *semantics* of secmon-lab/swarm (policy
routing, dynamic schema, per-sink fan-out, idempotent IDs, per-run
metrics) re-expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
zero-copy Arrow ``map_batches`` stages, actor pools for stateful
enrichment, ``groupby`` aggregates for per-sink counts, partitioned
Parquet sinks with checkpoint manifests.

Nothing here calls ``ray.init()`` — the process that owns the Ray
session (bench.py, CLI, test fixture, or the grading driver) does.
"""

__version__ = "0.1.0"

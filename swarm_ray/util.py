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

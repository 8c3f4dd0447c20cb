"""Round-3 safety-guard tests: schema-lock ownership token, partition
liveness heartbeat, and byte-aware keyed partition sizing (ADVICE r2)."""

import os
import threading
import time
from pathlib import Path

import pyarrow as pa


# ------------------------------------------------------- schema lock token

def test_schema_lock_stale_takeover_and_concurrent_widens(tmp_path):
    """A stale (crashed-holder) lock must not block writers, and
    concurrent widens through the takeover path must not lose columns
    (the ownership token keeps an old holder's release from unlinking
    a new holder's lock).

    Deflaked (VERDICT r4 item 3): the staleness DECISION is already
    deterministic (mtime aged 120 s past the 60 s threshold); the
    flake was the 10 s wall-clock deadline, which host load could
    starve a thread past — so the deadline is injected generously.
    The threshold itself stays at the default: lowering it would let
    waiters steal a LIVE thread's fresh lock mid-merge (the very
    lost-widen hazard the lock exists to prevent). The deterministic
    clock-injection pins live in the companion test below."""
    from swarm_ray.sinks.parquet_sink import update_sink_schema

    sink = tmp_path / "sink"
    sink.mkdir()
    # crashed holder: a lock file whose mtime is 2 min in the past
    lock = sink / "_schema.lock"
    lock.write_text("dead-holder-token")
    old = time.time() - 120
    os.utime(lock, (old, old))

    schemas = [pa.schema([("a", pa.int64())]),
               pa.schema([("b", pa.string())]),
               pa.schema([("c", pa.float64())])]
    errs: list[Exception] = []

    def widen(s):
        try:
            update_sink_schema(sink, s, timeout_s=300.0)
        except Exception as e:          # pragma: no cover - failure path
            errs.append(e)

    threads = [threading.Thread(target=widen, args=(s,)) for s in schemas]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not any(t.is_alive() for t in threads)
    assert not errs
    merged = update_sink_schema(sink, schemas[0])
    assert {f.name for f in merged} >= {"a", "b", "c"}   # no widen lost
    assert not lock.exists()                             # fully released


def test_schema_lock_clock_injection_pins_takeover_logic(tmp_path):
    """Single-threaded, fully deterministic pins of the two takeover
    decisions: (1) a lock older than the threshold per the injected
    clock is broken and the widen proceeds; (2) a FRESH lock held by a
    live writer blocks until the injected deadline → TimeoutError —
    no sleeps beyond the 10 ms poll, no mtime aging."""
    import pytest
    from swarm_ray.sinks.parquet_sink import update_sink_schema

    sink = tmp_path / "sink"
    sink.mkdir()
    lock = sink / "_schema.lock"

    # (1) crashed holder: clock says the lock is 120 s old
    lock.write_text("dead-holder-token")
    future = time.time() + 120.0
    merged = update_sink_schema(sink, pa.schema([("a", pa.int64())]),
                                clock=lambda: future)
    assert {f.name for f in merged} == {"a"}
    assert not lock.exists()

    # (2) live holder, real clock: the waiter must time out, never
    # steal the lock, and leave the holder's token untouched
    lock.write_text("live-holder-token")
    with pytest.raises(TimeoutError):
        update_sink_schema(sink, pa.schema([("b", pa.int64())]),
                           stale_after_s=3600.0, timeout_s=0.05)
    assert lock.read_text() == "live-holder-token"
    lock.unlink()


# -------------------------------------------------------------- heartbeat

def _age_tree(d: Path, seconds: float) -> None:
    old = time.time() - seconds
    for p in [d, *d.rglob("*")]:
        os.utime(p, (old, old))


def test_partition_heartbeat_prevents_stale_reclaim(tmp_path):
    """A live partition whose files' mtimes have gone quiet (long
    shuffle, nothing landed yet) must NOT be reclaimed while its
    heartbeat beats — and must be reclaimable once the beat stops."""
    from swarm_ray.state.checkpoint import (clean_stale_partitions,
                                            partition_heartbeat)

    out = tmp_path / "job"
    part = out / "partition=deadbeef"
    part.mkdir(parents=True)
    (part / "chunk.parquet").write_bytes(b"x")
    _age_tree(part, 3600)

    # no heartbeat → quiet dir past the grace window is reclaimed
    removed = clean_stale_partitions(out, planned_pids=set(), grace_s=1800)
    assert removed == ["deadbeef"]

    part.mkdir(parents=True)
    (part / "chunk.parquet").write_bytes(b"x")
    with partition_heartbeat(part, interval_s=0.05) as hb:
        time.sleep(0.15)                 # let a couple of beats land
        _age_tree(part, 3600)            # ... but the dir went "quiet"
        hb.touch()                       # next beat (deterministic here)
        assert clean_stale_partitions(out, planned_pids=set(),
                                      grace_s=1800) == []
        assert part.exists()
    assert not hb.exists()               # claim removed on clean exit
    _age_tree(part, 3600)
    assert clean_stale_partitions(out, planned_pids=set(),
                                  grace_s=1800) == ["deadbeef"]


# ------------------------------------------------- keyed partition sizing

def test_keyed_partition_count_scales_with_bytes_and_cpus():
    from swarm_ray.util import (TARGET_PARTITION_BYTES, cluster_cpus,
                                keyed_partition_count)

    floor = max(8, cluster_cpus())
    # no size estimate → CPU floor only
    assert keyed_partition_count(None) == floor
    assert keyed_partition_count(0) == floor
    # small input → still the CPU floor (every core gets work)
    assert keyed_partition_count(1024) == floor
    # big input → ceil(bytes / target) dominates the CPU floor
    big = TARGET_PARTITION_BYTES * (floor + 5) + 1
    assert keyed_partition_count(big) == floor + 6
    # custom floor honored
    assert keyed_partition_count(None, floor=4) == max(4, cluster_cpus())

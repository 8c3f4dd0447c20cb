"""Broadcast-lookup enrichment stage (SURVEY §2.3 ST2, §2.4)."""

import pyarrow as pa

from swarm_ray import fixtures
from swarm_ray.stages.enrich import EnrichStage


def test_left_join_hit_and_miss():
    stage = EnrichStage(intel=fixtures.intel_table())
    batch = pa.table({
        "source": pa.array(["cloudtrail", "nope", "vpc_flow"]),
        "x": pa.array([1, 2, 3]),
    })
    out = stage(batch)
    assert out["severity"].to_pylist() == [3, None, 1]
    assert out["tag"].to_pylist() == ["team-3", None, "team-1"]
    # never drops rows, keeps passthrough columns
    assert out["x"].to_pylist() == [1, 2, 3]


def test_intel_has_unused_entry():
    # the miss path in the other direction: intel rows absent from input
    srcs = fixtures.intel_table()["source"].to_pylist()
    assert "syslog_legacy" in srcs

"""Rule spec + vectorized compiler semantics (SURVEY §2.2 M1-M3)."""

import pyarrow as pa
import pytest

from swarm_ray.rules.compile import CompiledRuleset
from swarm_ray.rules.spec import Action, Cond, Rule, Ruleset, default_ruleset
from swarm_ray.stages.route import route_batch


def batch_of(rows):
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows]),
        "tokens": pa.array([r.get("tokens", [1, 2]) for r in rows], type=pa.list_(pa.int32())),
        "n_tok": pa.array([r.get("n_tok", 2) for r in rows], type=pa.int32()),
        "source": pa.array([r["source"] for r in rows]),
    })


def test_event_mask_or_semantics():
    rs = default_ruleset()
    c = CompiledRuleset(rs)
    b = batch_of([
        {"doc_id": "cloudtrail/part-00000/doc-00000001.log", "source": "cloudtrail"},
        {"doc_id": "cloudtrail/part-00000/doc-00000002.tmp", "source": "cloudtrail"},
        {"doc_id": "debug/part-00000/doc-00000003.log", "source": "debug"},
    ])
    assert c.event_mask(b).to_pylist() == [True, False, False]


def test_zero_match_drop_and_fanout():
    rs = default_ruleset()
    c = CompiledRuleset(rs)
    b = batch_of([
        {"doc_id": "access_log/part-00000/doc-00000001.log", "source": "access_log"},
        {"doc_id": "vpc_flow/part-00000/doc-00000002.log", "source": "vpc_flow"},
    ])
    routed = route_batch(b, c)
    # access_log fans out to 2 sinks; vpc_flow to 1
    assert len(routed) == 3
    sinks = sorted(set(zip(routed["sink_dataset"].to_pylist(),
                           routed["sink_table"].to_pylist())))
    assert sinks == [("logs", "access_audit"), ("logs", "access_raw"), ("logs", "vpc_flow")]


def test_rule_supplied_vs_generated_id():
    rs = default_ruleset()
    c = CompiledRuleset(rs)
    b = batch_of([
        {"doc_id": "cloudtrail/part-00000/doc-00000009.log", "source": "cloudtrail"},
        {"doc_id": "github_audit/part-00000/doc-00000010.log", "source": "github_audit"},
    ])
    routed = route_batch(b, c)
    ids = dict(zip(routed["source"].to_pylist(), routed["log_id"].to_pylist()))
    # cloudtrail rule uses id_field="doc_id" → raw value
    assert ids["cloudtrail"] == "cloudtrail/part-00000/doc-00000009.log"
    # github rule generates a 32-hex md5
    assert len(ids["github_audit"]) == 32
    int(ids["github_audit"], 16)


def test_action_validation_errors():
    # ≙ model.Log.Validate (reference pkg/domain/model/policy.go:73-89)
    with pytest.raises(ValueError, match="dataset"):
        Rule("r", (), (Action("", "t"),)).validate()
    with pytest.raises(ValueError, match="table"):
        Rule("r", (), (Action("d", ""),)).validate()


def test_spec_hash_stable_and_sensitive():
    a, b = default_ruleset(), default_ruleset()
    assert a.spec_hash() == b.spec_hash()
    c = Ruleset(event_rules=a.event_rules,
                schema_rules=a.schema_rules[:-1])
    assert c.spec_hash() != a.spec_hash()


def test_empty_batch_keeps_schema():
    rs = default_ruleset()
    c = CompiledRuleset(rs)
    b = batch_of([{"doc_id": "debug/part-00000/doc-00000003.log", "source": "debug"}])
    routed = route_batch(b.filter(pa.array([False])), c)
    assert len(routed) == 0
    assert "sink_dataset" in routed.column_names
    assert routed.schema.field("timestamp").type == pa.timestamp("us")

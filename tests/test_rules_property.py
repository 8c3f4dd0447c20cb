"""Property-based conformance: compiled Arrow rule engine ≡ pure-Python
oracle on randomized rulesets and inputs (hypothesis).

The reference pins rule semantics with table-driven cases; here the
whole (ruleset × input) space is sampled: every op in the Cond
vocabulary, 0-match drop, N-action fan-out, generated vs field ids,
field patches, partition granularities.
"""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from swarm_ray.rules.compile import CompiledRuleset
from swarm_ray.rules.spec import Action, Cond, Rule, Ruleset
from swarm_ray.stages.parse import parse_batch
from swarm_ray.stages.route import route_batch

from .oracle_py import route_rows

SOURCES = ["cloudtrail", "github_audit", "access_log", "vpc_flow", "debug"]
EXTS = [".log", ".gz", ".tmp"]

conds = st.one_of(
    st.builds(Cond, st.just("source"), st.just("eq"), st.sampled_from(SOURCES)),
    st.builds(Cond, st.just("source"), st.just("ne"), st.sampled_from(SOURCES)),
    st.builds(Cond, st.just("source"), st.just("isin"),
              st.lists(st.sampled_from(SOURCES), min_size=1, max_size=3).map(tuple)),
    st.builds(Cond, st.just("doc_id"), st.just("suffix"), st.sampled_from(EXTS)),
    st.builds(Cond, st.just("doc_id"), st.just("not_suffix"), st.sampled_from(EXTS)),
    st.builds(Cond, st.just("doc_id"), st.just("prefix"), st.sampled_from(SOURCES)),
    st.builds(Cond, st.just("doc_id"), st.just("contains"), st.sampled_from(["part-0", "doc-0"])),
    st.builds(Cond, st.just("n_tok"), st.sampled_from(["gt", "ge", "lt", "le"]),
              st.integers(min_value=0, max_value=12)),
)

actions = st.builds(
    Action,
    dataset=st.sampled_from(["ds_a", "ds_b"]),
    table=st.sampled_from(["t1", "t2", "t3"]),
    partition=st.sampled_from(["", "hour", "day", "month", "year"]),
    id_field=st.sampled_from([None, "doc_id"]),
    null_fields=st.sampled_from([(), ("tokens",)]),
)

rules = st.builds(
    Rule,
    name=st.sampled_from([f"r{i}" for i in range(6)]),
    where=st.lists(conds, min_size=0, max_size=3).map(tuple),
    actions=st.lists(actions, min_size=1, max_size=3).map(tuple),
)

rulesets = st.builds(
    Ruleset,
    event_rules=st.lists(rules, min_size=0, max_size=2).map(tuple),
    schema_rules=st.lists(rules, min_size=1, max_size=4).map(tuple),
)


@st.composite
def input_rows(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    rows = []
    for i in range(n):
        src = draw(st.sampled_from(SOURCES))
        ext = draw(st.sampled_from(EXTS))
        idx = draw(st.integers(min_value=0, max_value=10**6)) * 40 + i  # unique per row
        toks = draw(st.lists(st.integers(min_value=0, max_value=99_999),
                             min_size=0, max_size=6))
        rows.append({
            "doc_id": f"{src}/part-{idx // 257:05d}/doc-{idx:08d}{ext}",
            "tokens": toks,
            "n_tok": len(toks),
            "source": src,
        })
    return rows


def _batch_of(rows) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
        "tokens": pa.array([r["tokens"] for r in rows], type=pa.list_(pa.int32())),
        "n_tok": pa.array([r["n_tok"] for r in rows], type=pa.int32()),
        "source": pa.array([r["source"] for r in rows], type=pa.string()),
    })


@settings(max_examples=150, deadline=None)
@given(rs=rulesets, rows=input_rows())
def test_compiled_engine_matches_python_oracle(rs, rows):
    compiled = CompiledRuleset(rs)
    batch = _batch_of(rows)
    routed = route_batch(parse_batch(batch, compiled), compiled)

    want = route_rows(rows, rs)

    def key(d):
        return (d["sink_dataset"], d["sink_table"], d["log_id"],
                d["rule_name"], d["doc_id"])

    # multiset compare of the full routed surface (identical (rule,
    # action) pairs legitimately produce duplicate rows)
    def full(d):
        return key(d) + (d["timestamp"], tuple(d["tokens"] or ()))

    got = sorted(full(r) for r in routed.to_pylist())
    assert got == sorted(full(r) for r in want)

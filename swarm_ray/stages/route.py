"""Route stage — 0/N-match policy routing with vectorized fan-out.

≙ the reference's per-record schema-rule loop
(``pkg/usecase/load.go:210-247``): each eligible record is evaluated
against every schema rule; every matching (rule, action) emits one
routed row (N matches = fan-out, e.g. one access_log row feeding both
``logs.access_raw`` and ``logs.access_audit``); zero matches drop the
record (``:216-219``). Here the evaluation is per-BATCH: one boolean
mask per rule (pyarrow kernels), one ``Table.filter`` per rule shared
across its actions, sink identity attached as constant columns, and
the fan-out expressed as table concatenation — more output rows than
input, no per-row Python.

Output schema (stable across batches):
    <input columns...> + rule_name, sink_dataset, sink_table,
    sink_partition, log_id (32-hex or rule-supplied), timestamp[us]

``sink_dataset``/``sink_table`` are the shuffle/partition key for the
sink fan-out (≙ BigQueryDest, reference pkg/domain/model/policy.go:58-62).
"""

from __future__ import annotations

import pyarrow as pa

from ..rules.compile import CompiledRuleset
from ..rules.spec import Ruleset
from .ids import derive_timestamp, generated_log_id, partition_label


def _const(value: str, n: int) -> pa.Array:
    return pa.repeat(pa.scalar(value, type=pa.string()), n)


def route_batch(batch: pa.Table, compiled: CompiledRuleset) -> pa.Table:
    outs: list[pa.Table] = []
    n_cols = batch.column_names
    for rule, sub in compiled.iter_matches(batch):
        n = len(sub)
        ts = derive_timestamp(sub)
        gen_id: pa.Array | None = None  # compute at most once per rule
        for action in rule.actions:
            # field patches first (≙ json.patch removal, reference
            # README.md:56) — the generated id hashes the PATCHED record
            out = sub
            for name in action.null_fields:
                i = out.schema.get_field_index(name)
                out = out.set_column(i, name, pa.nulls(n, type=out.schema.field(i).type))
            if action.id_field is None:
                if action.null_fields:
                    log_id = generated_log_id(out)
                else:
                    if gen_id is None:
                        gen_id = generated_log_id(sub)
                    log_id = gen_id
            else:
                log_id = out[action.id_field].cast(pa.string()).combine_chunks()
            part = partition_label(ts, action.partition)
            for name, col in (
                ("rule_name", _const(rule.name, n)),
                ("sink_dataset", _const(action.dataset, n)),
                ("sink_table", _const(action.table, n)),
                ("sink_partition", part),
                ("log_id", log_id),
                ("timestamp", ts),
            ):
                out = out.append_column(name, col)
            outs.append(out)
    if not outs:
        # keep a stable empty schema so Ray can unify blocks
        empty = batch.schema
        for name, typ in (
            ("rule_name", pa.string()), ("sink_dataset", pa.string()),
            ("sink_table", pa.string()), ("sink_partition", pa.string()),
            ("log_id", pa.string()), ("timestamp", pa.timestamp("us")),
        ):
            empty = empty.append(pa.field(name, typ))
        return pa.table({f.name: pa.array([], type=f.type) for f in empty})
    return pa.concat_tables(outs)


class RouteStage:
    """Stateless task stage; ruleset compiled once per worker process."""

    def __init__(self, ruleset: Ruleset):
        self._ruleset = ruleset
        self._compiled: CompiledRuleset | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._compiled is None:
            self._compiled = CompiledRuleset(self._ruleset)
        return route_batch(batch, self._compiled)

    def __getstate__(self):
        return {"_ruleset": self._ruleset, "_compiled": None}

    def __setstate__(self, state):
        self.__dict__.update(state)

"""Compile a declarative Ruleset to vectorized Arrow evaluation.

The reference compiles all Rego policies once at startup and queries
them per object / per record (``pkg/infra/policy/client.go:63-120,
143-174``). Here "compilation" builds, once per worker, a table of
(mask-builder, actions) pairs whose predicates run as
``pyarrow.compute`` kernels over whole batches — no per-row Python in
the hot path. Fan-out is row replication via ``Table.filter``; drop is
the complement of the OR of all rule masks
(≙ 0-results drop, reference ``pkg/usecase/load.go:216-219``).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from .spec import Cond, Rule, Ruleset


def _compile_cond(cond: Cond) -> Callable[[pa.Table], pa.Array]:
    f, v = cond.field, cond.value
    op = cond.op
    if op == "eq":
        return lambda t: pc.equal(t[f], v)
    if op == "ne":
        return lambda t: pc.not_equal(t[f], v)
    if op == "prefix":
        return lambda t: pc.starts_with(t[f], pattern=v)
    if op == "suffix":
        return lambda t: pc.ends_with(t[f], pattern=v)
    if op == "not_suffix":
        return lambda t: pc.invert(pc.ends_with(t[f], pattern=v))
    if op == "contains":
        return lambda t: pc.match_substring(t[f], pattern=v)
    if op == "regex":
        return lambda t: pc.match_substring_regex(t[f], pattern=v)
    if op == "gt":
        return lambda t: pc.greater(t[f], v)
    if op == "ge":
        return lambda t: pc.greater_equal(t[f], v)
    if op == "lt":
        return lambda t: pc.less(t[f], v)
    if op == "le":
        return lambda t: pc.less_equal(t[f], v)
    if op == "isin":
        vs = pa.array(list(v))
        return lambda t: pc.is_in(t[f], value_set=vs)
    raise ValueError(f"unknown op {op!r}")


def _compile_where(conds: tuple[Cond, ...]) -> Callable[[pa.Table], pa.Array]:
    fns = [_compile_cond(c) for c in conds]

    def run(t: pa.Table) -> pa.Array:
        if not fns:
            return pa.array([True] * len(t), type=pa.bool_())
        mask = fns[0](t)
        for fn in fns[1:]:
            mask = pc.and_kleene(mask, fn(t))
        # null predicate result = no match (Rego undefined ⇒ no result)
        return pc.fill_null(mask, False)

    return run


class CompiledRuleset:
    """Once-per-worker compiled form of a Ruleset (≙ ST1, the compiled
    policy held by every reader goroutine in the reference)."""

    def __init__(self, ruleset: Ruleset):
        ruleset.validate()
        self.ruleset = ruleset
        self._event = [(_compile_where(r.where), r) for r in ruleset.event_rules]
        self._schema = [(_compile_where(r.where), r) for r in ruleset.schema_rules]

    # -- event level (object accept) ------------------------------------
    def event_mask(self, batch: pa.Table) -> pa.Array:
        """True where ANY event rule matches (0 matches ⇒ object
        rejected; reference pkg/usecase/event.go:16-20)."""
        if not self._event:
            return pa.array([True] * len(batch), type=pa.bool_())
        mask = self._event[0][0](batch)
        for fn, _ in self._event[1:]:
            mask = pc.or_(mask, fn(batch))
        return mask

    # -- schema level (record routing) ----------------------------------
    def schema_match_mask(self, batch: pa.Table) -> pa.Array:
        """True where at least one schema rule matches."""
        if not self._schema:
            return pa.array([False] * len(batch), type=pa.bool_())
        mask = self._schema[0][0](batch)
        for fn, _ in self._schema[1:]:
            mask = pc.or_(mask, fn(batch))
        return mask

    def iter_matches(self, batch: pa.Table):
        """Yield (rule, matching_sub_table) per schema rule; the mask is
        evaluated once per rule and shared by all of its actions."""
        for fn, rule in self._schema:
            mask = fn(batch)
            if pc.any(mask).as_py():
                yield rule, batch.filter(mask)

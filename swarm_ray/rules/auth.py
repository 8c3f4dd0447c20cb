"""Auth policy — the control-plane rule package (M7).

≙ the reference's ``data.auth`` Rego evaluation over an HTTP request
(``pkg/usecase/auth.go:16-43``): the middleware builds an
``AuthPolicyInput{Method, Path, Remote, Query, Header, Body}``
(``pkg/controller/server/middleware.go:17-46``), the policy may set
``output.Deny``, and the contract is **default-allow**: no matching
policy result means the request proceeds; a deny result raises.

Here the same contract runs over the engine's control plane (CLI / job
submission): auth rules reuse the spec's ``Cond`` predicate vocabulary
(the one source of truth for all three rule packages — event, schema,
auth), evaluated scalar-side because an auth decision guards ONE
request, not a batch. Multi-valued fields (``query``, ``header``)
match if ANY value matches, mirroring Rego iteration over
``map[string][]string``.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from .spec import Cond


class Unauthorized(Exception):
    """≙ types.ErrUnauthorized — 'denied by policy' (auth.go:54)."""


@dataclass(frozen=True)
class AuthPolicyInput:
    """≙ model.AuthPolicyInput (middleware.go:29-36)."""

    method: str = ""
    path: str = ""
    remote: str = ""
    query: dict[str, Any] = field(default_factory=dict)
    header: dict[str, Any] = field(default_factory=dict)
    body: str = ""

    def lookup(self, dotted: str) -> list[Any]:
        """Resolve ``header.authorization`` / ``query.token`` style
        fields to the list of candidate values (empty = absent)."""
        head, _, rest = dotted.partition(".")
        base = getattr(self, head, None)
        if base is None:
            return []
        if not rest:
            return [base]
        if isinstance(base, dict):
            v = base.get(rest)
            if v is None:
                return []
            return list(v) if isinstance(v, (list, tuple)) else [v]
        return []


def _match_value(cond: Cond, v: Any) -> bool:
    op, want = cond.op, cond.value
    if op == "eq":
        return v == want
    if op == "ne":
        return v != want
    if op == "prefix":
        return isinstance(v, str) and v.startswith(want)
    if op == "suffix":
        return isinstance(v, str) and v.endswith(want)
    if op == "not_suffix":
        return isinstance(v, str) and not v.endswith(want)
    if op == "contains":
        return isinstance(v, str) and want in v
    if op == "regex":
        return isinstance(v, str) and re.search(want, v) is not None
    if op == "gt":
        return v > want
    if op == "ge":
        return v >= want
    if op == "lt":
        return v < want
    if op == "le":
        return v <= want
    if op == "isin":
        return v in want
    raise ValueError(f"unknown op {op!r}")


@dataclass(frozen=True)
class AuthRule:
    """One auth rule: conjunction of predicates → deny (or explicit
    allow for documentation; Rego's output contract is a deny flag,
    so allow rules simply don't contribute)."""

    name: str
    where: tuple[Cond, ...]
    deny: bool = True

    def matches(self, inp: AuthPolicyInput) -> bool:
        # conjunction over conds; each cond matches if ANY candidate
        # value for its field matches (Rego set iteration semantics)
        return all(any(_match_value(c, v) for v in inp.lookup(c.field))
                   for c in self.where)


def authorize(inp: AuthPolicyInput, rules: list[AuthRule]) -> None:
    """Default-allow; raise ``Unauthorized`` iff any matching rule
    denies — exactly the reference's contract: ``ErrNoPolicyResult``
    is swallowed (allow), ``output.Deny`` raises (auth.go:28-43)."""
    for r in rules:
        if r.deny and r.matches(inp):
            raise Unauthorized(f"denied by policy rule {r.name!r}")


def load_auth_rules(path: str | Path) -> list[AuthRule]:
    """Load auth rules from YAML/JSON: ``auth_rules: [{name, deny,
    where: [{field, op, value}, ...]}, ...]`` — same file shape as the
    event/schema rule loader."""
    text = Path(path).read_text()
    if str(path).endswith((".yaml", ".yml")):
        import yaml
        doc = yaml.safe_load(text)
    else:
        doc = json.loads(text)
    out = []
    for r in doc.get("auth_rules", []):
        conds = tuple(Cond(c["field"], c["op"], c["value"])
                      for c in r.get("where", []))
        out.append(AuthRule(name=r["name"], where=conds,
                            deny=bool(r.get("deny", True))))
    return out

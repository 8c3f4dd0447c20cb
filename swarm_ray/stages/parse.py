"""Parse stage — vectorized grok/regex extraction + event-level filter.

≙ the reference's per-object event-rule evaluation + JSON parse
(``pkg/usecase/event.go:11-21``, ``pkg/usecase/load.go:271-281``),
restated over Arrow byte columns: one ``pyarrow.compute`` regex pass
extracts the structured components of the path-shaped ``doc_id``
(``{source}/part-{ppppp}/doc-{iiiiiiii}{ext}``), and rows whose
metadata matches no event rule are rejected before any further work —
the earliest possible prune, so rejected rows never reach the enrich /
route / write stages.

Stateless: plain function for ``map_batches(batch_format="pyarrow",
zero_copy_batch=True)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..rules.compile import CompiledRuleset

_PATH_RE = r"part-(?P<part_no>\d+)/doc-(?P<doc_idx>\d+)(?P<ext>\.\w+)$"


def parse_batch(batch: pa.Table, compiled: CompiledRuleset) -> pa.Table:
    """Event-filter then parse. Returns input columns + ``part_no:int32``,
    ``doc_idx:int64``, ``ext:string``."""
    batch = batch.filter(compiled.event_mask(batch))
    ext = pc.extract_regex(batch["doc_id"], _PATH_RE)
    return (
        batch
        .append_column("part_no", pc.cast(pc.struct_field(ext, "part_no"), pa.int32()))
        .append_column("doc_idx", pc.cast(pc.struct_field(ext, "doc_idx"), pa.int64()))
        .append_column("ext", pc.struct_field(ext, "ext"))
    )


class ParseStage:
    """Callable wrapper compiling the ruleset once per worker (≙ the
    once-compiled policy client, reference pkg/infra/policy/client.go:63-120).

    Used as a plain function-task stage: Ray pickles the instance to
    workers; the compiled kernels are rebuilt lazily on first batch
    because compiled closures hold Arrow scalars that may not pickle.
    """

    def __init__(self, ruleset):
        self._ruleset = ruleset
        self._compiled: CompiledRuleset | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._compiled is None:
            self._compiled = CompiledRuleset(self._ruleset)
        return parse_batch(batch, self._compiled)

    def __getstate__(self):
        return {"_ruleset": self._ruleset, "_compiled": None}

    def __setstate__(self, state):
        self.__dict__.update(state)

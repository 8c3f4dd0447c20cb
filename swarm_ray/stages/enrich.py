"""Enrich stage — stateful actor pool with a broadcast lookup table.

The north-star design adds threat-intel / schema lookup joins to
swarm's pipeline (swarm itself holds only the once-compiled policy
data, reference ``pkg/infra/policy/client.go:55-60``). This is the
canonical broadcast-hash-lookup: the small side is ``ray.put`` into the
object store ONCE on the driver; each actor fetches it ONCE in
``__init__``; every batch then does a vectorized ``pc.index_in`` +
``take`` — a left join with no shuffle, which is the only sane plan
when one side is KBs and the other is 100 TB.

Left-join semantics: an input ``source`` missing from the intel table
yields null enrichment columns, never a dropped row (FIXTURES.md F3).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray


def _as_intel_table(obj) -> pa.Table:
    if isinstance(obj, pa.Table):
        return obj
    raise TypeError(f"intel must be a pyarrow.Table, got {type(obj)}")


class EnrichStage:
    """``map_batches(EnrichStage, concurrency=N, batch_format="pyarrow",
    fn_constructor_kwargs={"intel_ref": ref})`` — actor pool; state
    built once per actor."""

    def __init__(self, intel_ref=None, intel: pa.Table | None = None,
                 key: str = "source"):
        if intel is None:
            intel = ray.get(intel_ref)  # broadcast: one object-store copy per node
        intel = _as_intel_table(intel).combine_chunks()
        self._key = key
        self._keys = intel[key].combine_chunks()
        self._payload = intel.drop_columns([key])

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch[self._key], value_set=self._keys)
        for name in self._payload.column_names:
            col = self._payload[name].combine_chunks().take(idx)
            batch = batch.append_column(name, col)
        return batch

from .schema import unify_widen, SchemaConflictError, schema_to_json, schema_from_json
from .parquet_sink import stamp_ingest, write_routed, sink_counts

__all__ = [
    "unify_widen", "SchemaConflictError", "schema_to_json", "schema_from_json",
    "stamp_ingest", "write_routed", "sink_counts",
]

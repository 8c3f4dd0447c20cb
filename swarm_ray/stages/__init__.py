from .ids import canonical_string, md5_hex, derive_timestamp
from .parse import parse_batch
from .enrich import EnrichStage
from .route import RouteStage

__all__ = [
    "canonical_string", "md5_hex", "derive_timestamp",
    "parse_batch", "EnrichStage", "RouteStage",
]

from .documents import (
    SPANS_SCHEMA_DDL,
    explode_spans,
    extract_geo_spans,
    extract_media_spans,
    reassemble_spans,
    span_fingerprint,
    verify_span_sequence,
)
from .fixtures import ensure_default_fixtures, write_fixtures

__all__ = [
    "SPANS_SCHEMA_DDL", "explode_spans", "extract_geo_spans",
    "extract_media_spans", "reassemble_spans", "span_fingerprint",
    "verify_span_sequence", "ensure_default_fixtures", "write_fixtures",
]

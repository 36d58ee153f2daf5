from .ingest import stream_extract_geo, stream_windowed_event_counts

__all__ = ["stream_extract_geo", "stream_windowed_event_counts"]

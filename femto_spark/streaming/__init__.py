from .ingest import stream_ingest  # noqa: F401

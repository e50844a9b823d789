from .ingest import TRANSCRIPT_DDL, fold_transcript_stream  # noqa: F401

from .ingest import TRANSCRIPT_DDL, fold_transcript_stream  # noqa: F401
from .probe import probe_file_stream, probe_stream  # noqa: F401

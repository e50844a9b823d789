"""Training-data-pipeline operators over document/embedding tables:
deduplication families, similarity search, text analysis, multimodal
column plumbing. All batch DataFrame programs; UDFs only where built-in
functions can't express the semantics (and then Arrow-vectorized)."""

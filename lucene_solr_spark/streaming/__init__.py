"""Near-real-time ingest: Structured Streaming micro-batches appended as
index segments (the soft-commit / NRT-reopen path of the reference,
DirectUpdateHandler2.java:97-123, SearcherManager.java)."""

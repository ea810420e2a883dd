"""Document ingest sources (batch + streaming)."""

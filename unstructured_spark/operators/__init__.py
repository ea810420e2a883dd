"""Engine operators: partitioners, chunking, enrichment, dedup, similarity."""

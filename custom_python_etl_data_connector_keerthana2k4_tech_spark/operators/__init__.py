"""Engine operators: keyed upsert sink, dedup family, similarity search."""

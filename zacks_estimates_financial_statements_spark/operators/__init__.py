"""Engine operators: the Parquet writer (upsert/delete semantics), range
join, dedup family, similarity search, and multimodal plumbing."""

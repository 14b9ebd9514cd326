"""Engine operators: relational builders, mutable-table upserts, dedup
family, similarity search, text analysis, event-time windows, multimodal
column handling."""

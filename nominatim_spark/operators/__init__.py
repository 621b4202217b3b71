"""Engine operators: spatial joins, dedup, similarity, text analysis."""

"""Engine operators: time-series, reshape, dedup, similarity, text."""

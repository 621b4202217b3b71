"""Sources: synthetic deterministic test data + table readers."""

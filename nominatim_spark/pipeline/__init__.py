"""Index-build and query pipelines (placex build, forward search, reverse)."""

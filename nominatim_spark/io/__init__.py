"""IO: per-stage checkpoints with lineage manifests."""

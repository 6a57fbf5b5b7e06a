"""Sources: parquet readers + the deterministic synthetic corpus."""

"""Sources: parquet readers + deterministic synthetic generators."""

"""Sources: Parquet transcript reader + deterministic synthetic generator."""

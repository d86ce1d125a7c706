"""Source adapters beyond the parquet fixtures (HTTP-snapshot decode)."""

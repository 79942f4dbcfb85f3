"""Table schemas, the parquet-backed catalog, and input sources."""

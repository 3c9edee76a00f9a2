"""Source helpers: inline collections, parquet scans, streaming sources."""

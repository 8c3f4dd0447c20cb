"""Input sources beyond the native Parquet reader."""

"""Dataset sources: Parquet pages (primary), text/CSV/JSON log readers."""

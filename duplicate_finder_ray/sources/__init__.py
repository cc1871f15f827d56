"""Dataset sources: Parquet code-table reader + synthetic derivations."""

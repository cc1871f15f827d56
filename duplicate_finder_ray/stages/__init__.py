"""Pipeline stages: per-batch transforms + groupby/shuffle wide steps."""

"""Checkpointing, lineage, and per-stage metrics (M7)."""

"""Pure scalar / vectorized functions (no Ray dependency)."""

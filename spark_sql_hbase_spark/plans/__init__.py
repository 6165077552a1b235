"""Plan inspection utilities: pushdown/pruning verification."""

"""Engine function library: deterministic aggregates, row-key generators,
text/hashing primitives shared by operators and queries."""

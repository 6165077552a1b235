"""Storage layer: keyed tables over key-sorted, range-partitioned Parquet."""

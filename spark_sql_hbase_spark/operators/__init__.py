"""Engine operators beyond stock Spark SQL: as-of join, dedup family
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding near-dup),
similarity search (brute-force + partitioned ANN), text analysis, and
multimodal column processing.

Design discipline (100 TB): every operator is partition-parallel and
shuffle-bounded — no ``collect()``-driven loops, no cartesian products,
broadcast only for provably-small sides, Arrow-batched pandas UDFs where
Python is unavoidable.
"""

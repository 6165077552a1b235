"""Managed multi-consumer caches for operator intermediates.

Several operators cache a derived relation that feeds two or more
consumers inside the ONE plan they return (quality scores feeding both
a percentile aggregate and bucket counts; the (doc, term, tf) aggregate
feeding N/df/weights/norms; the distance relation feeding stats and the
z-score projection).  The cache is load-bearing — uncached, the
expensive corpus pass would re-run once per consumer — but a bare
``.cache()`` never unpersists: across a 192-gate lane or repeated
production invocations the entries accumulate in the CacheManager until
an explicit ``clearCache()``.

:func:`managed_cache` bounds that to AT MOST ONE live cached relation
per operator key: re-entering the operator unpersists the previous
invocation's cache before registering the new one.  Safe because every
relation cached this way is DETERMINISTIC (no sampling, no
``spark_partition_id``) — a not-yet-consumed DataFrame from a prior
invocation silently recomputes the same values instead of reading the
dropped cache.  Relations whose recompute would be NON-deterministic
(e.g. the range-partitioned metadata in
:func:`~spark_sql_hbase_spark.operators.packing.shard_assignments`)
must NOT use this helper — they pin their own cache and expose the
handle for explicit unpersist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MANAGED: dict[str, DataFrame] = {}


def managed_cache(df: DataFrame, key: str) -> DataFrame:
    """Cache ``df`` under ``key``, unpersisting the previous holder."""
    prev = _MANAGED.pop(key, None)
    if prev is not None:
        try:
            prev.unpersist(False)
        except Exception:
            pass  # a stopped/replaced SparkSession — nothing to release
    out = df.cache()
    _MANAGED[key] = out
    return out


def clear_managed_caches() -> None:
    """Unpersist every managed cache (test/benchmark teardown hook)."""
    for key in list(_MANAGED):
        managed = _MANAGED.pop(key)
        try:
            managed.unpersist(False)
        except Exception:
            pass

"""Managed multi-consumer caches for operator intermediates.

Several operators cache a derived relation that feeds two or more
consumers inside the ONE plan they return (quality scores feeding both
a percentile aggregate and bucket counts; the (doc, term, tf) aggregate
feeding N/df/weights/norms; the distance relation feeding stats and the
z-score projection).  The cache is load-bearing — uncached, the
expensive corpus pass would re-run once per consumer — but a bare
``.cache()`` never unpersists: across a 200-gate lane or repeated
production invocations the entries accumulate in the CacheManager until
an explicit ``clearCache()``.

:func:`managed_cache` bounds that to AT MOST ONE live cached relation
per (session, operator key): re-entering the operator in the SAME
SparkSession unpersists the previous invocation's cache before
registering the new one, while a second concurrent SparkSession keys
separately and cannot unpersist a relation out from under the first
(r12 VERDICT watch item).  Entries whose SparkContext has stopped are
swept on every call, so a replaced session's DataFrames are dropped
rather than pinned alive indefinitely.

Safe because every relation cached this way is DETERMINISTIC (no
sampling, no ``spark_partition_id``) — a not-yet-consumed DataFrame
from a prior invocation silently recomputes the same values instead of
reading the dropped cache.  Relations whose recompute would be
NON-deterministic (e.g. the range-partitioned metadata in
:func:`~spark_sql_hbase_spark.operators.packing.shard_assignments`)
must NOT use this helper — they pin with an eager ``localCheckpoint``
so re-sampling is impossible.

Thread-safety: the registry dict is lock-guarded, so interleaved
invocations from parallel gates/tests sharing one session cannot race
the pop/insert; the unpersist-on-re-entry policy still means two
IN-FLIGHT invocations of the same operator in one session share the
single cache slot (the later one evicts the earlier — correct, the
relations are deterministic, but the earlier consumer recomputes).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_MANAGED: dict[tuple[str, str], DataFrame] = {}
_LOCK = threading.Lock()


def _app_id(df: DataFrame) -> str:
    """The owning session's applicationId ('' if already stopped)."""
    try:
        return df.sparkSession.sparkContext.applicationId
    except Exception:
        return ""


def _unpersist_quietly(df: DataFrame) -> None:
    try:
        df.unpersist(False)
    except Exception:
        pass  # a stopped/replaced SparkSession — nothing to release


def managed_cache(df: DataFrame, key: str) -> DataFrame:
    """Cache ``df`` under (its session, ``key``), unpersisting the same
    session's previous holder and sweeping dead-session entries."""
    app = _app_id(df)
    with _LOCK:
        prev = _MANAGED.pop((app, key), None)
        # sweep entries whose SparkContext has stopped: their caches are
        # gone with the context, keeping them only pins driver memory
        dead = [k for k in _MANAGED if _app_id(_MANAGED[k]) != k[0]]
        stale = [_MANAGED.pop(k) for k in dead]
        out = df.cache()
        _MANAGED[(app, key)] = out
    if prev is not None:
        _unpersist_quietly(prev)
    for s in stale:
        _unpersist_quietly(s)
    return out


def clear_managed_caches() -> None:
    """Unpersist every managed cache (test/benchmark teardown hook)."""
    with _LOCK:
        drained = [_MANAGED.pop(k) for k in list(_MANAGED)]
    for df in drained:
        _unpersist_quietly(df)

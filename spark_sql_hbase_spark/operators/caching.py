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
(r12 VERDICT watch item).  The unpersist MUST happen before the
``.cache()`` call: CacheManager matches by plan equivalence, so on the
normal re-entry (same operator over the same inputs) caching first
would make ``cache()`` a no-op against the old entry and the
unpersist-after would drop the SHARED entry — leaving the new result
silently uncached and every consumer re-running the corpus pass.

Entries whose SparkContext has stopped are swept when a call first
observes a NEW applicationId (one JVM hosts one context at a time, so
that is exactly when previous-session entries become dead), so a
replaced session's DataFrames are dropped rather than pinned alive
indefinitely — without paying a per-call py4j probe per entry.

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
_LAST_APP: str | None = None


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
    session's previous holder FIRST (plan-equivalent re-entries must
    re-register, see module docstring) and sweeping dead-session
    entries when the session changes."""
    global _LAST_APP
    app = _app_id(df)
    with _LOCK:
        prev = _MANAGED.pop((app, key), None)
        if prev is not None:
            _unpersist_quietly(prev)
        if app != _LAST_APP:
            # first call under a new session: sweep entries whose own
            # context has stopped (their caches died with it; keeping
            # them only pins driver memory)
            dead = [k for k in _MANAGED if _app_id(_MANAGED[k]) != k[0]]
            for k in dead:
                _unpersist_quietly(_MANAGED.pop(k))
            _LAST_APP = app
        out = df.cache()
        _MANAGED[(app, key)] = out
    return out


def clear_managed_caches() -> None:
    """Unpersist every managed cache (test/benchmark teardown hook)."""
    with _LOCK:
        drained = [_MANAGED.pop(k) for k in list(_MANAGED)]
    for df in drained:
        _unpersist_quietly(df)

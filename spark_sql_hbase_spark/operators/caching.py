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
registering the new one, and a second SparkSession — whether a fresh
SparkContext or a same-JVM ``spark.newSession()`` sibling — keys its
own slot (the key carries the session object's identity, not just the
applicationId), so re-entry in one session never pops another
session's REGISTRY slot (r13 ADVICE).  Shared-context caveat: sibling
sessions from ``spark.newSession()`` share ONE CacheManager, which
matches by plan equivalence — if two siblings cache equivalent plans
they share the underlying cached relation, and either side's
re-entry unpersist drops it for both.  No per-slot registry can
prevent that (the sharing lives below the session boundary); it is
safe here because every managed relation is deterministic, so the
evicted sibling silently recomputes the same values.  The unpersist
MUST happen before the ``.cache()`` call: CacheManager matches by plan
equivalence, so on the normal re-entry (same operator over the same
inputs) caching first would make ``cache()`` a no-op against the old
entry and the unpersist-after would drop the SHARED entry — leaving
the new result silently uncached and every consumer re-running the
corpus pass.

Entries whose SparkContext has stopped are swept when a call first
observes an applicationId never seen before in this process (one JVM
hosts one context at a time, so a genuinely NEW id means every earlier
context's entries are dead), so a replaced session's DataFrames are
dropped rather than pinned alive indefinitely — without paying a
per-call py4j probe per entry, and without re-sweeping when calls
alternate between already-observed sessions (r13 ADVICE).

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

_MANAGED: dict[tuple[str, int, str], DataFrame] = {}
_LOCK = threading.Lock()
_SEEN_APPS: set[str] = set()


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
    entries when a never-before-seen applicationId appears.  The slot
    key carries ``id(sparkSession)`` next to the applicationId so
    same-JVM ``newSession()`` siblings keep separate slots (see the
    shared-CacheManager caveat in the module docstring)."""
    app = _app_id(df)
    slot = (app, id(df.sparkSession), key)
    with _LOCK:
        prev = _MANAGED.pop(slot, None)
        if prev is not None:
            _unpersist_quietly(prev)
        if app not in _SEEN_APPS:
            # first call under a genuinely new context: every entry
            # belonging to an earlier context is dead (their caches
            # died with it; keeping them only pins driver memory).
            # Alternating calls between live same-context sessions
            # never re-enter this branch (r13 ADVICE).
            dead = [k for k in _MANAGED if _app_id(_MANAGED[k]) != k[0]]
            for k in dead:
                _unpersist_quietly(_MANAGED.pop(k))
            _SEEN_APPS.add(app)
        out = df.cache()
        _MANAGED[slot] = out
    return out


def clear_managed_caches() -> None:
    """Unpersist every managed cache (test/benchmark teardown hook)."""
    with _LOCK:
        drained = [_MANAGED.pop(k) for k in list(_MANAGED)]
    for df in drained:
        _unpersist_quietly(df)

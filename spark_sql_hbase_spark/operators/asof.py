"""As-of join: for each left row, the most recent right row at or before
the left timestamp, per key.

Neither the reference nor stock Spark has a dedicated as-of operator
(SURVEY §2.B notes range/as-of joins are "not special-cased in the
reference either" — they fall to generic non-equi joins). A naive
``left JOIN right ON key AND r.ts <= l.ts`` + argmax explodes to
O(|left|·|right per key|) intermediate rows, which is fatal at 100 TB.

This implementation is the canonical single-shuffle algorithm:

1. union the two inputs, tagged by side (right rows sort *before* left
   rows at equal timestamps → inclusive ``<=`` semantics);
2. one shuffle: window partitioned by key, ordered by (ts, side, order
   cols) — a total order, so results are deterministic under ties;
3. forward-fill the right-side payload with ``last(..., ignorenulls)``
   over an unbounded-preceding ROWS frame (O(1) running state per row);
4. keep left rows; optionally null out matches older than ``tolerance``.

Cost: one shuffle of |left|+|right| rows on the join key — the same cost
as the best possible sort-merge strategy; AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Attach the latest ``right`` row at-or-before each ``left`` row's ts.

    Parameters
    ----------
    on: equality key column(s), present in both sides with identical names.
    left_ts / right_ts: timestamp columns.
    right_cols: {right column -> output alias} payload to attach.
    tolerance: optional max age (as an interval/duration Column); matches
        older than ``left_ts - tolerance`` are nulled out.
    direction: only "backward" (the common as-of semantics) is implemented;
        "forward" is its mirror via descending order.
    """
    keys = [on] if isinstance(on, str) else list(on)
    out_aliases = list(right_cols.values())

    right_part = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
    )
    left_part = left.select(
        "*", F.col(left_ts).alias(_TS), F.lit(1).alias(_SIDE)
    )
    unioned = left_part.unionByName(right_part, allowMissingColumns=True)

    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    side_order = F.col(_SIDE).asc()  # right rows first at equal ts → inclusive
    tie_orders = [F.col(a).asc_nulls_first() for a in out_aliases]
    w = (
        W.partitionBy(*keys)
        .orderBy(ts_order, side_order, *tie_orders)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    filled = unioned.select(
        "*",
        *[
            F.last(a, ignorenulls=True).over(w).alias(f"__fill_{a}")
            for a in out_aliases
        ],
        F.last(F.when(F.col(_SIDE) == 0, F.col(_TS)), ignorenulls=True)
        .over(w)
        .alias("__fill_ts"),
    )

    result = filled.filter(F.col(_SIDE) == 1)
    for a in out_aliases:
        matched = F.col(f"__fill_{a}")
        if tolerance is not None:
            matched = F.when(
                F.col("__fill_ts") >= F.col(_TS) - tolerance, matched
            )
        result = result.withColumn(a, matched)
    drop = [_SIDE, _TS, "__fill_ts"] + [f"__fill_{a}" for a in out_aliases]
    return result.drop(*drop)


def resample_ffill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Regular-grid resampling with forward fill — the time-series
    gap-filling primitive (downsample an irregular event stream to a
    fixed cadence, carrying the last observation forward through empty
    buckets; pandas ``resample().ffill()`` semantics, distributed).

    Emits ``(key, bucket, value)`` for EVERY grid cell between each
    key's first and last bucket; ``value`` is the last observation at or
    before the cell (never null — the first cell always holds a real
    observation by construction).

    Determinism: the per-bucket "last" is ``max(struct(ts, order, v))``
    — a lexicographic struct max over the unique ``(ts, order_col)``
    total order, never ``last()`` (partition-order-dependent).

    Plan shape (scales to 100 TB): ONE input scan — the cached per-(key,
    bucket) aggregate feeds both the span rollup and the fill join;
    the grid explode is a row-local ``sequence``; the fill window
    partitions by key and orders by bucket — per-key grid cardinality,
    the same scale class as sessionization (q21's accepted window).
    Dense multi-year grids per key multiply rows by span/cadence — pick
    ``unit`` accordingly (the knob, not a hidden cost).
    """
    step = F.expr(f"interval 1 {unit}")
    b = F.date_trunc(unit, F.col(ts_col))
    per_bucket = (
        events.groupBy(F.col(key_col).alias("key"), b.alias("bucket"))
        .agg(
            F.max(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(order_col).alias("o"),
                    F.col(value_col).alias("v"),
                )
            ).alias("__last")
        )
        .select("key", "bucket", F.col("__last.v").alias("v"))
        # cached: the spans branch prunes the value aggregate away, so
        # its subtree can never be exchange-reused against the join
        # branch — caching the (key, bucket, v) relation (tiny: one row
        # per occupied grid cell) makes both consumers share one input
        # scan; same caller-clearCache contract as the LSH/bigram caches
        .cache()
    )
    # spans derive from per_bucket (date_trunc is monotone, so
    # min/max(bucket) == trunc(min/max(ts))) — one input scan total, not
    # two; the rollup runs over the already-aggregated tiny relation
    spans = per_bucket.groupBy("key").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        "key", F.explode(F.sequence("lo", "hi", step)).alias("bucket")
    )
    joined = grid.join(per_bucket, ["key", "bucket"], "left_outer")
    w = (
        W.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "key", "bucket", F.last("v", ignorenulls=True).over(w).alias("value")
    )

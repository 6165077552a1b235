"""Range (interval) join: points ⋈ intervals on ts ∈ [start, end].

Spark has no native range-join strategy (the reference inherits the same
gap — SURVEY §2.B "Joins" row: "range/as-of join = non-equi condition …
not special-cased in reference either"): a plain
``points.join(intervals, ts.between(start, end))`` plans as
BroadcastNestedLoopJoin (or a cartesian product when neither side fits in
memory) — O(|points| × |intervals|) comparisons and a single-node build
side. Unusable when both sides are large.

The scalable formulation is BINNING: quantize time into fixed-width
buckets, explode each interval into the buckets it covers, tag each point
with its single bucket, equi-join on the bucket id (hash/sort-merge —
shuffle-parallel), and re-check the exact range as a residual filter.

Cost model (the knob is ``bucket_width``):

- interval side blows up by ``avg_span / width + 1`` rows;
- each point matches each overlapping interval in at most ONE bucket copy
  (the point's bucket is unique), so no post-join dedup is needed;
- candidate pairs per bucket ≈ points_per_bucket × intervals covering it.

Pick width ≈ the median interval span: wider wastes residual comparisons,
narrower inflates the interval side. Skew: a bucket inside many
overlapping intervals is a hot join key — AQE skew-join splits it; for
pathological overlap stacks, pre-aggregate intervals per bucket.

This is the equi-join reduction used by production range-join
implementations (e.g. Databricks' range-join hint and PostGIS-style
spatial binning), expressed in stock DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__range_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width_seconds: int = 300,
) -> DataFrame:
    """Inner-join ``points`` to ``intervals`` where
    ``start_col <= ts_col <= end_col`` (inclusive ends), as a bucketed
    equi-join + residual filter. Output columns = points ∪ intervals.

    Intervals with ``end < start`` produce no matches (the residual
    filter is unsatisfiable). All three columns must be timestamps.
    """
    w = F.lit(int(bucket_width_seconds))
    b_points = points.withColumn(_B, F.floor(F.unix_timestamp(F.col(ts_col)) / w))
    b_intervals = intervals.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / w),
                F.floor(F.unix_timestamp(F.col(end_col)) / w),
            )
        ),
    )
    return (
        b_points.join(b_intervals, _B)
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop(_B)
    )

"""Skew-mitigation operators for 100 TB workloads.

AQE already splits skewed JOIN partitions (`spark.sql.adaptive.skewJoin`,
on by default in this engine's session). What AQE does NOT fix is a
skewed **aggregation** whose per-key state is itself huge (heavy-hitter
keys funneling into single reducers) and broadcast-impossible **skew
joins** against a hot key set. These helpers provide the standard
remedies as reusable operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase salted aggregation: groupBy(keys + salt) computes
    ``partial_aggs``, then groupBy(keys) combines with ``final_aggs``.

    Use when a handful of heavy-hitter keys would serialize a plain
    groupBy: the first phase spreads each hot key over ``salt`` reducers;
    the second combines ``salt`` small partials per key. For algebraic
    aggregates (sum/count/min/max) the result is identical to the
    unsalted groupBy.

    ``partial_aggs``: alias → aggregate over input columns.
    ``final_aggs``:   alias → aggregate over the partial columns.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(a) for a, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(*[c.alias(a) for a, c in final_aggs.items()])


def salted_count_sum(
    df: DataFrame, keys: list[str], value: str, salt: int = DEFAULT_SALT
) -> DataFrame:
    """Salted count + exact decimal sum per key (the common heavy-hitter
    shape). Emits (keys..., n_rows, sum_<value>)."""
    from spark_sql_hbase_spark.functions.det import DEC

    out = salted_groupby(
        df,
        keys,
        partial_aggs={
            "__n": F.count(F.lit(1)),
            "__s": F.sum(F.col(value).cast(DEC)),
        },
        final_aggs={
            "n_rows": F.sum("__n"),
            f"sum_{value}": F.round(F.sum("__s"), 2).cast("double"),
        },
        salt=salt,
    )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    hot_keys: list,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Skew join via hot-key salting: left rows with hot keys get a random
    salt, the right side replicates its hot-key rows ``salt`` times (one
    per salt value), and the join key becomes (key, salt). Non-hot keys
    join with salt 0 on both sides — no replication.

    Use when the hot side is too large to broadcast and AQE's skew split
    can't help (e.g. the skew is in a shuffle hash join build side).
    ``hot_keys`` comes from a cheap pre-pass
    (``df.groupBy(key).count().orderBy(desc("count")).limit(k)``).
    """
    hot = F.array(*[F.lit(k) for k in hot_keys])
    l_salted = left.withColumn(
        "__salt",
        F.when(
            F.array_contains(hot, F.col(on)), (F.rand(seed=42) * salt).cast("int")
        ).otherwise(F.lit(0)),
    )
    r_salted = right.withColumn(
        "__salts",
        F.when(
            F.array_contains(hot, F.col(on)),
            F.sequence(F.lit(0), F.lit(salt - 1)),
        ).otherwise(F.array(F.lit(0))),
    ).withColumn("__salt", F.explode("__salts")).drop("__salts")
    return l_salted.join(r_salted, [on, "__salt"], how).drop("__salt")

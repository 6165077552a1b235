"""Relational query pack — exercises the *inherited* Spark SQL operator
surface that the reference re-registers wholesale (SURVEY §2.B; reference
``HBaseSessionStateBuilder.scala:90-107``): scans, projection/filter,
joins (broadcast/shuffle, semi/anti), aggregation (hash/distinct/rollup/
cube/grouping sets), window functions, sort/limit/top-k, set operations,
scalar functions, conditional aggregation, correlated subqueries, pivot,
time-bucketed aggregation, sessionization, and as-of joins.

Every query is written DataFrame-first with deterministic aggregates
(:mod:`spark_sql_hbase_spark.functions.det`) and carries a DuckDB oracle.

Scale notes are inline per query: the driver runs these at sf0.01/sf0.1,
but each plan is chosen to survive 100 TB (broadcast only provably-small
sides, single-shuffle window tricks instead of O(n·m) joins, map-side
partial aggregation everywhere).
"""

from __future__ import annotations

import pandas as pd  # module-scope: pandas_udf type-hint inference
# resolves stringified annotations (future-annotations) against the
# UDF function's __globals__, so `pd.Series` hints need `pd` here

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_sql_hbase_spark.functions.det import DEC, davg, davg_sql, dsum, dsum_sql
from spark_sql_hbase_spark.queries import register, table


# ---------------------------------------------------------------------------
# q01 — TPC-H Q1 pricing summary: filter → hash-agg with partial aggregation.
# ---------------------------------------------------------------------------
@register(
    "zd01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity', 'sum_qty')},
           {dsum_sql('l_extendedprice', 'sum_base_price')},
           {dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {davg_sql('l_quantity', 'avg_qty')},
           {davg_sql('l_extendedprice', 'avg_price')},
           {davg_sql('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1: scan+filter+group-by agg (map-side combine, 6 groups)",
)
def zd01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — global top-k: ORDER BY ... LIMIT → TakeOrderedAndProject (no full
# sort at scale: per-partition top-k then merge on the driver).
# ---------------------------------------------------------------------------
@register(
    "z02_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    description="top-k via TakeOrderedAndProject (deterministic tiebreak)",
)
def z02_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q03 — TPC-H Q5 regional revenue: 6-way join. region/nation are broadcast
# (constant-size dims); customer⋈orders⋈lineitem⋈supplier shuffle on keys;
# AQE reorders/broadcasts as stats allow.
# ---------------------------------------------------------------------------
@register(
    "a01_regional_revenue",
    oracle=f"""
    SELECT n_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    description="TPC-H Q5: multi-way join with broadcast dims + shuffle joins",
)
def a01_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Join order pushes the ASIA selection to the LEAVES (inner joins
    # commute, so the result set is identical to the textbook order the
    # oracle states): region⋈nation (constant-size, broadcast) restricts
    # supplier and customer FIRST, so the fact-side shuffles carry only
    # the ~1/R of rows that can ever survive — the filter-last order
    # shuffled every lineitem through two exchanges and dropped 4/5 of
    # them at the top (guide §2.3: shuffle fewer bytes; §3: reduce the
    # big side before shuffling it).
    cu = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    n_asia = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    s_asia = s.join(F.broadcast(n_asia), s.s_nationkey == n_asia.n_nationkey).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    cu_asia = cu.join(
        F.broadcast(n_asia), cu.c_nationkey == n_asia.n_nationkey, "left_semi"
    ).select("c_custkey", "c_nationkey")
    return (
        cu_asia.join(o, cu_asia.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s_asia, (li.l_suppkey == s_asia.s_suppkey) & (cu_asia.c_nationkey == s_asia.s_nationkey))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# q04 — TPC-H Q4 shape: EXISTS → left-semi join (never materializes the
# match side; at scale the semi join shuffles only distinct keys).
# ---------------------------------------------------------------------------
@register(
    "z03_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    """,
    description="EXISTS via left-semi join + agg",
)
def z03_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q05 — explicit broadcast join: part (dim) into lineitem (fact).
# ---------------------------------------------------------------------------
@register(
    "z04_brand_revenue",
    oracle=f"""
    SELECT p_brand,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    description="broadcast hash join dim→fact + agg",
)
def z04_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q06 — TPC-H Q6: pure scan+filter+agg; filters push to parquet row groups.
# ---------------------------------------------------------------------------
@register(
    "z05_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount', 'revenue', 4)},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 25
    """,
    description="TPC-H Q6: predicate-pushdown scan + global agg",
)
def z05_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 25)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", 4),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — top-k per group: window row_number with full tiebreak. One shuffle
# on l_suppkey; at scale this is the canonical "no global sort" top-k.
# ---------------------------------------------------------------------------
@register(
    "zd07_topk_parts_per_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, l_partkey,
               {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM lineitem GROUP BY l_suppkey, l_partkey
    )
    SELECT l_suppkey, l_partkey, revenue, CAST(rn AS INTEGER) AS rn FROM (
        SELECT *, row_number() OVER (
            PARTITION BY l_suppkey ORDER BY revenue DESC, l_partkey
        ) AS rn
        FROM rev
    ) WHERE rn <= 3
    """,
    description="window row_number top-3 per group over pre-aggregated revenue",
)
def zd07_topk_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan note: aggregate-then-window = two shuffles of (suppkey,partkey)
    # aggregates. In THIS synthetic data the pairs are ~unique (591k
    # groups from 600k rows at sf0.1), so partial aggregation barely
    # reduces and a single repartition(suppkey) would be locally faster —
    # but at a real TPC-H distribution (~7.5 rows/pair) the partial agg
    # shrinks BOTH shuffles ~7×, which is the 100 TB-correct trade.
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey", "l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    w = W.partitionBy("l_suppkey").orderBy(F.col("revenue").desc(), F.col("l_partkey"))
    return rev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


# ---------------------------------------------------------------------------
# q08 — running totals + lag/lead: aggregate-over-window with ROWS frame.
# ---------------------------------------------------------------------------
@register(
    "z06_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS running_spend,
           lag(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_price,
           lead(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS next_price
    FROM orders
    """,
    description="running decimal sum + lag/lead per customer",
)
def z06_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast(DEC)).over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
            2,
        )
        .cast("double")
        .alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


# ---------------------------------------------------------------------------
# q09 — ROLLUP with NULL-indicator-free output (COALESCE to 'ALL').
# ---------------------------------------------------------------------------
@register(
    "z23_rollup",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           {dsum_sql('l_quantity', 'sum_qty')},
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    description="ROLLUP aggregation (partial totals + grand total)",
)
def q09_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


# ---------------------------------------------------------------------------
# q10 — CUBE + GROUPING SETS via the SQL API (spark.sql passthrough — the
# reference's CLI path, HBaseSQLClient.scala:98).
# ---------------------------------------------------------------------------
@register(
    "z28_grouping_sets",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           {dsum_sql('o_totalprice', 'sum_price')},
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    description="GROUPING SETS via SQL API",
)
def z28_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS orderpriority,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE)
                   AS sum_price,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# q11 — set operations: INTERSECT / EXCEPT, tagged and unioned.
# ---------------------------------------------------------------------------
@register(
    "z29_setops",
    oracle="""
    SELECT 'with_orders' AS tag, c_custkey AS key FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'without_orders' AS tag, c_custkey AS key FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'only_in_first_bag' AS tag, l_partkey AS key FROM (
        SELECT l_partkey FROM lineitem WHERE l_quantity >= 25
        EXCEPT ALL
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    )
    UNION ALL
    SELECT 'in_both_bags' AS tag, l_partkey AS key FROM (
        SELECT l_partkey FROM lineitem WHERE l_quantity >= 25
        INTERSECT ALL
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    )
    """,
    description="set + multiset ops: INTERSECT / EXCEPT (distinct) and "
    "INTERSECT ALL / EXCEPT ALL (bag semantics), tagged and unioned "
    "(merged round-1 q11+q33)",
)
def z29_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    building = cu.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    order_cust = o.select(F.col("o_custkey").alias("c_custkey"))
    with_orders = building.intersect(order_cust).select(
        F.lit("with_orders").alias("tag"), F.col("c_custkey").alias("key")
    )
    without = building.exceptAll(order_cust).distinct().select(
        F.lit("without_orders").alias("tag"), F.col("c_custkey").alias("key")
    )
    big = li.filter(F.col("l_quantity") >= 25).select("l_partkey")
    ret = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    only_first = big.exceptAll(ret).select(
        F.lit("only_in_first_bag").alias("tag"), F.col("l_partkey").alias("key")
    )
    both = big.intersectAll(ret).select(
        F.lit("in_both_bags").alias("tag"), F.col("l_partkey").alias("key")
    )
    return with_orders.unionAll(without).unionAll(only_first).unionAll(both)


# ---------------------------------------------------------------------------
# z42 — NOT EXISTS (demoted round 4; was q12: q18 keeps the subquery family in-window) → left-anti join.
# ---------------------------------------------------------------------------
@register(
    "z42_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    description="NOT EXISTS via left-anti join",
)
def z42_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return cu.join(o, cu.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# z54 — scalar function coverage (demoted round 5; was q13, r1-r4 green:
# q01/q16/q18 keep scalar expressions in-window): string/math/CASE *and*
# date extraction /
# formatting in one per-row projection over orders (merged round-1 q13+q14
# so both surfaces carry driver signal inside the 50-entry window). All
# expressions are JVM-side and whole-stage-codegen'd.
# ---------------------------------------------------------------------------
@register(
    "z54_scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 1, 8)) AS prio8,
           CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
           o_orderstatus || '/' || o_orderpriority AS status_prio,
           abs(o_custkey - 500) AS cust_dist,
           o_orderkey % 7 AS key_mod,
           CASE WHEN o_totalprice > 150000 THEN 'HI'
                WHEN o_totalprice > 50000 THEN 'MID'
                ELSE 'LO' END AS price_band,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mth,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
    description="scalar string/math/CASE/date expression coverage (one projection)",
)
def z54_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 8)).alias("prio8"),
        F.length("o_orderpriority").cast("int").alias("prio_len"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.abs(F.col("o_custkey") - 500).alias("cust_dist"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.when(F.col("o_totalprice") > 150000, "HI")
        .when(F.col("o_totalprice") > 50000, "MID")
        .otherwise("LO")
        .alias("price_band"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mth"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


# ---------------------------------------------------------------------------
# q15 — exact DISTINCT aggregation (expand + two-phase agg in Spark).
# ---------------------------------------------------------------------------
@register(
    "z07_distinct_agg",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
    description="exact count-distinct per group",
)
def z07_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    return cu.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# q16 — approximate distinct (HLL++) + quantile sketch, SELF-VALIDATING.
#
# Sketch outputs are engine-specific, so the raw sketch values cannot be
# value-oracled against DuckDB. Instead the query emits the EXACT per-group
# values alongside booleans asserting the sketches sit inside their error
# bounds; the DuckDB twin computes the same exact values and literal TRUEs.
# Both HLL++ and the Greenwald-Khanna-style quantile sketch are deterministic
# functions of the data, so the booleans are stable run-to-run and the row is
# fully hash-matchable — this asserts the sketches' error bounds instead of
# ignoring them:
#   * parts_ok/orders_ok: |approx - exact| / exact <= 0.05 (sketch built at
#     rsd=0.02, checked at 2.5 sigma).
#   * p50_ok/p95_ok: the sketch quantile lies between the exact interpolated
#     percentiles at a +/-2%-rank band (sketch rank error is 1/accuracy =
#     0.1%, so the band has 20x headroom; a data value at rank r in
#     [p-0.001, p+0.001] is always within [pct_cont(p-0.02), pct_cont(p+0.02)]
#     because order statistics are monotone in rank).
# Reference parity: approx aggregates are part of the inherited Spark SQL
# surface the reference session exposes (HBaseSessionStateBuilder.scala:101).
# ---------------------------------------------------------------------------
@register(
    "zd16_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_ok,
           TRUE AS orders_ok,
           TRUE AS p50_ok,
           TRUE AS p95_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="approx_count_distinct (HLL++) + percentile_approx sketches, "
    "validated in-query against exact values (error-bound booleans); the "
    "oracle twin computes the exact values and literal TRUEs.",
)
def zd16_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_ap"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_ao"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("_p50"),
        F.percentile_approx("l_extendedprice", 0.95, 1000).alias("_p95"),
        F.percentile("l_extendedprice", 0.48).alias("_p48"),
        F.percentile("l_extendedprice", 0.52).alias("_p52"),
        F.percentile("l_extendedprice", 0.93).alias("_p93"),
        F.percentile("l_extendedprice", 0.97).alias("_p97"),
    )
    return g.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        (
            F.abs(F.col("_ap") - F.col("exact_parts")) / F.col("exact_parts") <= F.lit(0.05)
        ).alias("parts_ok"),
        (
            F.abs(F.col("_ao") - F.col("exact_orders")) / F.col("exact_orders") <= F.lit(0.05)
        ).alias("orders_ok"),
        ((F.col("_p50") >= F.col("_p48")) & (F.col("_p50") <= F.col("_p52"))).alias("p50_ok"),
        ((F.col("_p95") >= F.col("_p93")) & (F.col("_p95") <= F.col("_p97"))).alias("p95_ok"),
    )


# ---------------------------------------------------------------------------
# q17 — conditional aggregation: CASE-gated sums and counts.
# ---------------------------------------------------------------------------
@register(
    "z30_conditional_agg",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           {dsum_sql("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END", 'urgent_rev')}
    FROM orders
    GROUP BY o_orderstatus
    """,
    description="CASE-gated conditional aggregation",
)
def z30_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)).alias("n_big"),
        dsum(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).otherwise(
                F.lit(0.0)
            ),
            "urgent_rev",
        ),
    )


# ---------------------------------------------------------------------------
# zb01 (was q18) — TPC-H Q17 shape: per-key average joined back (correlated subquery
# decorrelated into agg + broadcast join-back).
# ---------------------------------------------------------------------------
@register(
    "zb01_below_avg_quantity",
    oracle=f"""
    WITH pavg AS (
        SELECT l_partkey AS pk, {davg_sql('l_quantity', 'avg_qty')}
        FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_small,
           {dsum_sql('l_extendedprice', 'small_rev')}
    FROM lineitem JOIN pavg ON l_partkey = pk
    WHERE l_quantity < 0.5 * avg_qty
    """,
    description="correlated-subquery shape: per-part avg, join-back, filter",
)
def zb01_below_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(davg("l_quantity", "avg_qty"))
    return (
        li.join(F.broadcast(pavg), li.l_partkey == pavg.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.count(F.lit(1)).alias("n_small"), dsum("l_extendedprice", "small_rev"))
    )


# ---------------------------------------------------------------------------
# q19 — pivot (wide aggregation).
# ---------------------------------------------------------------------------
@register(
    "z31_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'qty_o')},
           {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'qty_f')}
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="pivot on l_linestatus with fixed value set",
)
def z31_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(F.col("l_quantity").cast(DEC)), 2).cast("double"))
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
    )


# ---------------------------------------------------------------------------
# z41 — time-window aggregation (demoted round 4; was q20: q35 keeps time-windows in-window) over the event stream: tumbling (5 min) AND
# sliding (15 min sliding by 5 → each event lands in 3 windows, planned as
# an explode + map-side-combined hash agg) in one tagged union (merged
# round-1 q20+q36; batch analogue of the Structured Streaming pipeline in
# streaming/ — same F.window operator).
# ---------------------------------------------------------------------------
@register(
    "z41_events_windows",
    oracle=f"""
    SELECT 'tumbling' AS win_kind,
           strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S')
               AS win_start,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value', 'sum_value', 4)}
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS win_kind,
           strftime(time_bucket(INTERVAL '5 minutes', ts)
                    - k * INTERVAL '5 minutes', '%Y-%m-%d %H:%M:%S')
               AS win_start,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value', 'sum_value', 4)}
    FROM events, (VALUES (0), (1), (2)) offsets(k)
    GROUP BY 2, 3
    """,
    description="tumbling (5m) + sliding (15m/5m) window aggregation, tagged union",
)
def z41_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def _windowed(win: F.Column, kind: str) -> DataFrame:
        return (
            ev.groupBy(win.alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value", 4))
            .select(
                F.lit(kind).alias("win_kind"),
                F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                    "win_start"
                ),
                "event_type",
                "n_events",
                "sum_value",
            )
        )

    return _windowed(F.window("ts", "5 minutes"), "tumbling").unionAll(
        _windowed(F.window("ts", "15 minutes", "5 minutes"), "sliding")
    )


# ---------------------------------------------------------------------------
# q21 — sessionization: gap>30min starts a new session. Single shuffle on
# user_id; lag + conditional cumsum — the canonical scalable pattern.
# ---------------------------------------------------------------------------
@register(
    "zd21_sessionization",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('millisecond', lag(ts) OVER w, ts) > 1800000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS sess_id
        FROM marked
    )
    SELECT user_id, sess_id, COUNT(*) AS n_events,
           date_diff('millisecond', min(ts), max(ts)) AS dur_ms
    FROM sess
    GROUP BY user_id, sess_id
    """,
    description="sessionization via lag + conditional cumsum (one shuffle)",
)
def zd21_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))) > 1800000),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = marked.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("dur_ms"),
    )


# ---------------------------------------------------------------------------
# q22 — as-of join (purchase → most recent preceding click per user), via
# the engine's scalable union+window implementation (operators/asof.py).
# ---------------------------------------------------------------------------
@register(
    "zd22_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ), j AS (
        SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST
               ) AS rn
        FROM purchases p
        LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT purchase_id, user_id, click_id FROM j WHERE rn = 1
    """,
    description="as-of (backward, inclusive) join via single-shuffle union+window",
)
def zd22_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols={"event_id": "click_id"},
        tolerance=None,
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"), "user_id", "click_id"
    )


# ---------------------------------------------------------------------------
# q23 — ranking family: rank / dense_rank / ntile with deterministic order.
# ---------------------------------------------------------------------------
@register(
    "z24_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    description="rank/dense_rank/ntile per nation",
)
def q23_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return cu.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# q24 — argmax via agg + join-back (deterministic even under value ties).
# ---------------------------------------------------------------------------
@register(
    "z08_richest_customer_per_nation",
    oracle="""
    WITH mx AS (
        SELECT c_nationkey AS nk, max(c_acctbal) AS max_bal
        FROM customer GROUP BY c_nationkey
    )
    SELECT n_name, min(c_custkey) AS custkey, max_bal
    FROM customer
    JOIN mx ON c_nationkey = nk AND c_acctbal = max_bal
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, max_bal
    """,
    description="argmax per group via max + join-back (tie-safe)",
)
def z08_richest_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    mx = cu.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.max("c_acctbal").alias("max_bal")
    )
    return (
        cu.join(
            F.broadcast(mx),
            (cu.c_nationkey == mx.nk) & (cu.c_acctbal == mx.max_bal),
        )
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "max_bal")
        .agg(F.min("c_custkey").alias("custkey"))
        .select("n_name", "custkey", "max_bal")
    )


# ---------------------------------------------------------------------------
# q25 — scalar Pandas UDF (Arrow-vectorized Python; the §2.B "PythonEvals"
# surface). sha256 digest per row — vectorized over Arrow batches, never
# row-at-a-time.
# ---------------------------------------------------------------------------
@register(
    "z32_pandas_udf_digest",
    oracle="""
    SELECT c_custkey, sha256(c_name) AS name_sha
    FROM customer
    """,
    description="scalar @pandas_udf (Arrow batches) computing sha256 per row",
)
def z32_pandas_udf_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from pyspark.sql.functions import pandas_udf

    # modern type-hint form (PandasUDFType is deprecated upstream);
    # stringified future-annotations resolve via get_type_hints against
    # the module globals, where `pd` is imported
    def _sha(s: pd.Series) -> pd.Series:
        return s.map(lambda x: hashlib.sha256(x.encode("utf-8")).hexdigest())

    sha_udf = pandas_udf(_sha, "string")

    cu = table(spark, sf_dir, "customer")
    return cu.select("c_custkey", sha_udf("c_name").alias("name_sha"))


# ---------------------------------------------------------------------------
# q26 — exact interpolated percentiles per group (sort-agg path).
# ---------------------------------------------------------------------------
@register(
    "z09_percentiles",
    oracle="""
    SELECT c_nationkey,
           ROUND(quantile_cont(c_acctbal, 0.25), 4) AS p25,
           ROUND(quantile_cont(c_acctbal, 0.50), 4) AS p50,
           ROUND(quantile_cont(c_acctbal, 0.75), 4) AS p75
    FROM customer
    GROUP BY c_nationkey
    """,
    description="exact interpolated quartiles of account balance per nation",
)
def z09_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    return cu.groupBy("c_nationkey").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("c_acctbal", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("c_acctbal", F.lit(0.75)), 4).alias("p75"),
    )


# ---------------------------------------------------------------------------
# zb02 (was q27) — salted two-phase aggregation (heavy-hitter-safe groupBy): same
# result as a plain groupBy, but hot keys spread over 16 reducers first.
# ---------------------------------------------------------------------------
@register(
    "zb02_salted_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {dsum_sql('l_extendedprice', 'sum_l_extendedprice')}
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="salted two-phase aggregation (skew-proof heavy-hitter groupBy)",
)
def zb02_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.skew import salted_count_sum

    li = table(spark, sf_dir, "lineitem")
    return salted_count_sum(li, ["l_returnflag"], "l_extendedprice", salt=16)


# ---------------------------------------------------------------------------
# zb03 (was q28) — skew join with hot-key salting: revenue for a known-hot key set
# joined back to part attributes without broadcasting or AQE reliance.
#
# The hot-key set is a PARAMETER, not a computed pre-pass: at 100 TB you
# get it from table statistics, an offline sampling job, or operational
# knowledge — never by groupBy-count-collecting the fact table inside the
# query itself (round-1 version did exactly that: a full extra shuffle of
# lineitem before the real work; the sampled alternative can't be exact,
# and this engine's test data is near-uniform so an estimated top-k isn't
# even well-defined).  AQE skew-join (on in session.py) handles the same
# case automatically when the skew shows up at runtime; salted_join is the
# deterministic, planner-independent form.
# ---------------------------------------------------------------------------
_Q28_HOT_KEYS = [100, 200, 300]

@register(
    "zb03_salted_join",
    oracle=f"""
    SELECT p_partkey, p_brand,
           COUNT(*) AS n_items,
           {dsum_sql('l_extendedprice', 'revenue')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_partkey IN ({", ".join(str(k) for k in _Q28_HOT_KEYS)})
    GROUP BY p_partkey, p_brand
    """,
    description="hot-key salted join (replicate-right, parameterized hot set) "
    "+ aggregation",
)
def zb03_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k"), "l_extendedprice"
    )
    p = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"), "p_partkey", "p_brand"
    )
    hot = _Q28_HOT_KEYS
    # isin on the fact side pushes into the parquet scan (PushedFilters: In)
    joined = salted_join(li.filter(F.col("k").isin(hot)), p, on="k", hot_keys=hot)
    return joined.groupBy("p_partkey", "p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice", "revenue"),
    )


# ---------------------------------------------------------------------------
# z55 — full outer join (demoted round 5; was q29, r1-r4 green: q03/q22/
# q28/r01 keep the join family in-window): per-nation customer and
# supplier counts, keeping
# nations that have only one side.
# ---------------------------------------------------------------------------
@register(
    "z55_full_outer_join",
    oracle="""
    WITH c AS (
        SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1
    ), s AS (
        SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1
    )
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    description="full outer join of per-nation aggregates with COALESCE",
)
def z55_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    c_agg = cu.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s_agg = s.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        c_agg.join(s_agg, c_agg.nk_c == s_agg.nk_s, "full_outer")
        .select(
            F.coalesce("nk_c", "nk_s").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


# ---------------------------------------------------------------------------
# q30 — cartesian product (BroadcastNestedLoopJoin) of two tiny dims — the
# only join shape where a cross product is legitimate.
# ---------------------------------------------------------------------------
@register(
    "z10_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    WHERE n.n_regionkey <> r.r_regionkey
    """,
    description="cross join of bounded dims + theta filter (nested-loop join)",
)
def z10_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return (
        r.crossJoin(F.broadcast(n))
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .select("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# q31 — TPC-H Q3 shipping priority: selective join + agg + global top-10.
# ---------------------------------------------------------------------------
@register(
    "z11_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3: selective multi-join, agg, TakeOrdered top-10",
)
def z11_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        cu.join(o, cu.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q32 — TPC-H Q10 returned items: 4-way join + agg + top-20 customers.
# ---------------------------------------------------------------------------
@register(
    "z12_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
           c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1994-04-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10: returned-item revenue per customer, top-20",
)
def z12_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1994-04-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        cu.join(o, cu.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q34 — semi-structured JSON column: parse props, extract fields, aggregate
# (the json/map function-registry surface).
# ---------------------------------------------------------------------------
@register(
    "z33_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    description="JSON field extraction (get_json_object / from_json) + agg",
)
def z33_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# q35 — native session-window aggregation (F.session_window): Spark's own
# gap-based session operator (the engine twin of the hand-rolled q21 /
# streaming st02). Session = [min ts, max ts + gap); single shuffle on
# (user_id, merged session), merging done by the operator — at scale this
# beats the two-pass window-function formulation when sessions are short.
# ---------------------------------------------------------------------------
@register(
    "zf14_session_window_native",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('millisecond', lag(ts) OVER w, ts) > 1800000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sess_id
        FROM marked
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sess_id
    """,
    description="F.session_window gap-based sessions (native Spark operator)",
)
def zf14_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# q40 — TPC-H Q22 shape: uncorrelated scalar subquery (global avg) gating a
# filter, then anti join. The scalar is a 1-row aggregate cross-joined back
# (broadcast) — the distributed formulation of a scalar subquery: no
# driver-side collect, and the fact side streams against a 1-row build.
# ---------------------------------------------------------------------------
@register(
    "zg09_waiting_customers",
    oracle=f"""
    WITH cavg AS (
        SELECT {davg_sql('c_acctbal', 'avg_bal')}
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey,
           COUNT(*) AS n_custs,
           {dsum_sql('c_acctbal', 'total_bal')}
    FROM customer, cavg
    WHERE c_acctbal > cavg.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    description="scalar subquery (broadcast 1-row agg) + anti join + agg",
)
def zg09_waiting_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cavg = cu.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal", "avg_bal"))
    return (
        cu.crossJoin(F.broadcast(cavg))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, cu.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_custs"), dsum("c_acctbal", "total_bal"))
    )


# ---------------------------------------------------------------------------
# q41 — TPC-H Q13 shape: left outer join with an extra join-side predicate
# (so customers whose only orders fail it still count as 0), per-customer
# count, then a histogram over the counts. Two shuffles: custkey, c_count.
# ---------------------------------------------------------------------------
@register(
    "zg10_order_count_histogram",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
    description="left outer join w/ join-side predicate + count histogram",
)
def zg10_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    c_orders = (
        cu.join(
            o,
            (cu.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q42 — grouped-map applyInPandas: per-group custom computation on whole
# Arrow-batched groups (the remaining pandas API shape next to scalar
# pandas_udf q25 / mapInPandas m01-m02 / applyInPandasWithState st02).
# Median is order-independent (sorted interpolation), so the result is
# deterministic under shuffle — unlike a double sum, which would need the
# det.py decimal trick that pandas can't replicate bit-for-bit.
# Scale: one shuffle on the grouping key; each group must fit one worker's
# memory (groups here are event types — bounded cardinality, big rows →
# for huge groups the pattern is pre-aggregate or mapInPandas instead).
# ---------------------------------------------------------------------------
@register(
    "zg69_grouped_pandas_median",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(median(value), 6) AS med_value,
           ROUND(quantile_cont(value, 0.9) - quantile_cont(value, 0.1), 6)
               AS decile_spread
    FROM events
    GROUP BY event_type
    """,
    description="grouped applyInPandas: exact per-group median + decile spread",
)
def zg69_grouped_pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    ev = table(spark, sf_dir, "events").select("event_type", "value")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        q10, q50, q90 = np.quantile(v, [0.1, 0.5, 0.9])  # linear interpolation
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_events": [len(v)],
                "med_value": [round(q50, 6)],
                "decile_spread": [round(q90 - q10, 6)],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        stats, "event_type string, n_events bigint, med_value double, decile_spread double"
    )


# ---------------------------------------------------------------------------
# zb05 (was r01) — range (interval) join via bucketed equi-join (operators/rangejoin).
# Intervals = the 20 busiest 5-minute buckets, widened to [bucket-10min,
# bucket+15min); points = all events. A naive ts-BETWEEN join would plan
# as a nested-loop; the operator turns it into a shuffle-parallel hash
# join on the bucket id + residual filter (asserted in test_plans).
# ---------------------------------------------------------------------------
@register(
    "zb05_interval_join",
    oracle=f"""
    WITH b AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS bs, COUNT(*) AS c
        FROM events GROUP BY 1
    ), top AS (
        SELECT bs, row_number() OVER (ORDER BY c DESC, bs) AS interval_id
        FROM b
    ), iv AS (
        SELECT interval_id,
               bs - INTERVAL '10 minutes' AS s,
               bs + INTERVAL '15 minutes' AS e
        FROM top WHERE interval_id <= 20
    )
    SELECT interval_id,
           COUNT(*) AS n_events,
           {dsum_sql('value', 'sum_value', 4)}
    FROM iv JOIN events ON ts >= s AND ts <= e
    GROUP BY interval_id
    """,
    description="interval join (ts in [start,end]) as bucketed equi-join",
)
def zb05_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.rangejoin import interval_join

    ev = table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        F.window("ts", "5 minutes").getField("start").alias("bs")
    ).agg(F.count(F.lit(1)).alias("c"))
    top = (
        buckets.withColumn(
            "interval_id",
            F.row_number().over(W.orderBy(F.col("c").desc(), F.col("bs"))),
        )
        .filter(F.col("interval_id") <= 20)
        .select(
            "interval_id",
            (F.col("bs") - F.expr("INTERVAL 10 MINUTES")).alias("s"),
            (F.col("bs") + F.expr("INTERVAL 15 MINUTES")).alias("e"),
        )
    )
    joined = interval_join(ev.select("ts", "value"), top, "ts", "s", "e")
    return joined.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value", 4)
    )


# ---------------------------------------------------------------------------
# q43 — grouped-aggregate pandas UDF (the UDAF shape): a custom Arrow-
# batched aggregate usable in groupBy (and over windows). XOR is
# commutative/associative, so the result is order- and partition-
# independent — the property a custom distributed aggregate must have.
# ---------------------------------------------------------------------------
@register(
    "zg98_pandas_udaf_xor",
    oracle="""
    SELECT event_type,
           bit_xor(event_id) AS xor_ids,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    description="grouped-agg pandas_udf (custom UDAF): XOR digest per group",
)
def q43_pandas_udaf_xor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # modern type-hint form: Series -> scalar hints infer GROUPED_AGG
    # (PandasUDFType is deprecated upstream)
    @pandas_udf("long")
    def xor_agg(ids: pd.Series) -> int:
        return int(np.bitwise_xor.reduce(ids.to_numpy(dtype=np.int64)))

    # Spark disallows mixing pandas and JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count is a pandas agg too
    @pandas_udf("long")
    def count_agg(ids: pd.Series) -> int:
        return len(ids)

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        xor_agg("event_id").alias("xor_ids"),
        count_agg("event_id").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# z89 — regular-grid resample + forward fill (round-5 addition;
# operators/asof.py::resample_ffill): the time-series gap-filling
# primitive — hourly grid per user between first and last observation,
# per-bucket deterministic last value (struct max over the unique
# (ts, event_id) order), empty buckets forward-filled.  Oracle: same
# grid via generate_series + IGNORE NULLS window.
# ---------------------------------------------------------------------------
@register(
    "zg59_resample_ffill",
    oracle="""
    WITH e AS (
        SELECT user_id AS key, date_trunc('hour', ts) AS bucket,
               ts, event_id, value
        FROM events
    ), pb AS (
        SELECT key, bucket, value AS v FROM (
            SELECT *, row_number() OVER (
                PARTITION BY key, bucket ORDER BY ts DESC, event_id DESC
            ) AS rn FROM e
        ) WHERE rn = 1
    ), sp AS (
        SELECT key, date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM e GROUP BY key
    ), grid AS (
        SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM sp
    ), j AS (
        SELECT g.key, g.bucket, pb.v
        FROM grid g LEFT JOIN pb ON g.key = pb.key AND g.bucket = pb.bucket
    )
    SELECT key AS user_id,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY key ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value
    FROM j
    """,
    description="hourly resample + forward fill: per-user grid, "
    "deterministic per-bucket last, ffill through empty cells",
)
def zg59_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.operators.asof import resample_ffill

    ev = table(spark, sf_dir, "events")
    out = resample_ffill(ev, "user_id", "ts", "value", "event_id", unit="hour")
    return out.select(
        F.col("key").alias("user_id"),
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "value",
    )


# ---------------------------------------------------------------------------
# z91 — unpivot / melt (round-5 addition): the wide→long reshape
# (DataFrame.unpivot, SQL UNPIVOT) — the inverse of z31's pivot and the
# missing half of the reshape surface.  Part measures melt into
# (p_partkey, measure, value) rows; oracle = UNION ALL.
# ---------------------------------------------------------------------------
@register(
    "zg57_unpivot_measures",
    oracle="""
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_partkey <= 500
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice
    FROM part WHERE p_partkey <= 500
    """,
    description="unpivot/melt: wide part measures to (key, measure, value) "
    "long form — the inverse of the pivot gate",
)
def zg57_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# z97 — RANGE-frame rolling window (round-5 addition): per-user rolling
# 1-hour event count and decimal-exact value sum, frame bounded by TIME
# (RANGE BETWEEN 3600s PRECEDING AND CURRENT ROW over epoch seconds) —
# the value-based frame the ROWS-frame gates (z06/z24) don't exercise.
# Ties at the same second share a frame edge by definition, so the
# result is deterministic without an id tiebreak.
# ---------------------------------------------------------------------------
@register(
    "zg58_rolling_range_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))) OVER w, 4) AS DOUBLE)
               AS sum_1h
    FROM (SELECT event_id, user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec, value FROM events)
    WINDOW w AS (
        PARTITION BY user_id ORDER BY sec
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
    description="RANGE-frame rolling window: per-user trailing-1-hour "
    "count + decimal-exact sum, time-bounded frame",
)
def zg58_rolling_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        F.col("value").cast("decimal(38,6)").alias("value"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).cast("double").alias("sum_1h"),
    )


# ---------------------------------------------------------------------------
# zc05 — LATERAL correlated subquery (round-6 addition): per-customer
# top-3 orders via a correlated LATERAL (ORDER BY ... LIMIT 3) — the
# joins-family member the inventory lacked (SQL:1999 LATERAL; Spark
# decorrelates it into a ranked window join, so no nested-loop
# re-execution per outer row).  DuckDB runs the identical statement.
# ---------------------------------------------------------------------------
_ZC05 = """
SELECT c.c_custkey AS custkey, o.o_orderkey AS orderkey,
       o.o_totalprice AS totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
WHERE c.c_custkey <= 200
"""


@register(
    "zg05_lateral_topk",
    oracle=_ZC05,
    description="correlated LATERAL subquery: per-customer top-3 orders, "
    "decorrelated by Catalyst into a ranked join",
)
def zg05_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_ZC05)


# ---------------------------------------------------------------------------
# zc06 — ordered event funnel (round-6 addition): view -> click ->
# purchase conversion, where each stage must happen strictly AFTER the
# user's entry into the previous stage (min-timestamp chaining — the
# standard product-analytics funnel).  Shape: ONE corpus scan, ONE
# user-keyed shuffle — per user, the view entry is a plain min while
# the later stages gather that user's click/purchase timestamps into
# arrays (partial-agg'd map-side; shuffle volume = those timestamps,
# 8 bytes each) and chain via array_min(filter(arr, > prev)) — then a
# single 3-row stage relation.  The lag window over 3 rows is the
# documented bounded-relation case.  Output: per-stage user counts +
# conversion from the previous stage (one IEEE division of exact
# counts).
# ---------------------------------------------------------------------------
@register(
    "zg06_event_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
          WHERE e.event_type = 'purchase' GROUP BY e.user_id),
    n AS (SELECT 1 AS stage_no, 'view' AS stage,
                 CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS users
          UNION ALL SELECT 2, 'click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
          UNION ALL SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT))
    SELECT stage_no, stage, users,
           CASE WHEN lag(users) OVER (ORDER BY stage_no) > 0
                THEN CAST(users AS DOUBLE) / lag(users) OVER (ORDER BY stage_no)
                ELSE CAST(1.0 AS DOUBLE) END AS conv_from_prev
    FROM n ORDER BY stage_no
    """,
    description="ordered view->click->purchase funnel: one scan, one "
    "user-keyed shuffle, stage chaining via per-user time arrays",
)
def zg06_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t0"),
        F.collect_list(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).alias("clicks"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("purchases"),
    )
    t1 = F.array_min(
        F.filter("clicks", lambda x: F.col("t0").isNotNull() & (x > F.col("t0")))
    )
    chained = per_user.withColumn("t1", t1).withColumn(
        "t2",
        F.array_min(
            F.filter(
                "purchases", lambda x: F.col("t1").isNotNull() & (x > F.col("t1"))
            )
        ),
    )
    counts = chained.agg(
        F.count("t0").alias("n_view"),
        F.count("t1").alias("n_click"),
        F.count("t2").alias("n_purchase"),
    )
    stages = counts.select(
        F.expr(
            "stack(3, 1, 'view', n_view, 2, 'click', n_click, "
            "3, 'purchase', n_purchase) AS (stage_no, stage, users)"
        )
    )
    w = W.orderBy("stage_no")
    prev = F.lag("users").over(w)
    return stages.select(
        "stage_no",
        "stage",
        "users",
        F.when(prev > 0, F.col("users").cast("double") / prev)
        .otherwise(F.lit(1.0))
        .alias("conv_from_prev"),
    ).orderBy("stage_no")


# ---------------------------------------------------------------------------
# zc07 — weekly retention cohorts (round-6 addition): users grouped by
# first-seen week; for each (cohort_week, week_offset), how many came
# back and what fraction of the cohort that is.  Shape: ONE corpus
# scan -> distinct (user, week) pairs (one shuffle) -> the cohort week
# as a per-user window min over the pairs (user-keyed shuffle; NO
# second scan or self-join) -> one cohort-week aggregate.  All
# week/offset arithmetic is exact date math (ISO Monday truncation in
# both engines); retention is one IEEE division of exact counts.
# ---------------------------------------------------------------------------
@register(
    "zg07_retention_cohorts",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    ),
    withc AS (
        SELECT user_id, week,
               MIN(week) OVER (PARTITION BY user_id) AS cohort_week
        FROM pairs
    ),
    act AS (
        SELECT cohort_week, week,
               CAST(datediff('day', cohort_week, week) / 7 AS BIGINT)
                   AS week_offset,
               COUNT(*) AS active_users
        FROM withc GROUP BY 1, 2
    ),
    sized AS (
        SELECT cohort_week,
               MAX(CASE WHEN week_offset = 0 THEN active_users END)
                   OVER (PARTITION BY cohort_week) AS cohort_size,
               week_offset, active_users
        FROM act
    )
    SELECT cohort_week, week_offset, CAST(active_users AS BIGINT) AS active_users,
           CAST(active_users AS DOUBLE) / cohort_size AS retention
    FROM sized ORDER BY cohort_week, week_offset
    """,
    description="weekly retention cohorts: one scan, cohort via per-user "
    "window min over distinct pairs, cohort-normalized retention",
)
def zg07_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    withc = pairs.withColumn(
        "cohort_week", F.min("week").over(W.partitionBy("user_id"))
    )
    act = (
        withc.groupBy("cohort_week", "week")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
            "active_users",
        )
    )
    size = F.max(
        F.when(F.col("week_offset") == 0, F.col("active_users"))
    ).over(W.partitionBy("cohort_week"))
    return act.select(
        "cohort_week",
        "week_offset",
        F.col("active_users").cast("long").alias("active_users"),
        (F.col("active_users").cast("double") / size).alias("retention"),
    ).orderBy("cohort_week", "week_offset")


# ---------------------------------------------------------------------------
# zc12 — TPC-H Q19-style disjunctive-conjunctive join (round-6
# addition): revenue over lineitem ⋈ part under an OR of three
# (brand, size-range, quantity-range) conjunctions — the classic
# optimizer test for pushing a disjunctive predicate through a join
# (Catalyst extracts the common l_partkey equi-condition; the
# brand/size legs prune the part side before the join).  Decimal-exact
# revenue per the dsum convention.
# ---------------------------------------------------------------------------
@register(
    "zg13_disjunctive_join_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 20 AND 30)
    """,
    description="TPC-H Q19-style disjunctive join: OR-of-conjunctions "
    "through an equi-join, decimal-exact revenue",
)
def zg13_disjunctive_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_sql_hbase_spark.functions.det import dsum

    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (p.p_brand == "Brand#12") & p.p_size.between(1, 15)
        & li.l_quantity.between(1, 11)
    ) | (
        (p.p_brand == "Brand#23") & p.p_size.between(1, 20)
        & li.l_quantity.between(10, 20)
    ) | (
        (p.p_brand == "Brand#34") & p.p_size.between(1, 25)
        & li.l_quantity.between(20, 30)
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).filter(cond)
    return j.agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# zc13 — TPC-H Q11-style share-of-group HAVING (round-6 addition):
# suppliers whose account balance exceeds 5% of their NATION's total —
# the correlated-aggregate-threshold shape (Q11's partsupp value share,
# on the supplier relation this dataset ships).  The comparison is
# EXACT decimal arithmetic (balance·20 > nation total) — no division,
# no double summation-order dependence; the per-nation total is a
# broadcast-joined aggregate, not a window over the fact.
# ---------------------------------------------------------------------------
@register(
    "zg08_share_of_nation_having",
    oracle="""
    WITH tot AS (
        SELECT s_nationkey,
               SUM(CAST(s_acctbal AS DECIMAL(38,6))) AS nation_total
        FROM supplier WHERE s_acctbal > 0 GROUP BY s_nationkey
    )
    SELECT s.s_suppkey, s.s_name, s.s_acctbal,
           CAST(s.s_nationkey AS BIGINT) AS nationkey
    FROM supplier s JOIN tot t ON s.s_nationkey = t.s_nationkey
    WHERE s.s_acctbal > 0
      AND CAST(s.s_acctbal AS DECIMAL(38,6)) * 20 > t.nation_total
    """,
    description="TPC-H Q11-style share threshold: balance > 5% of "
    "nation total via exact decimal compare, broadcast agg join",
)
def zg08_share_of_nation_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0)
    tot = s.groupBy("s_nationkey").agg(
        F.sum(F.col("s_acctbal").cast("decimal(38,6)")).alias("nation_total")
    )
    return (
        s.join(F.broadcast(tot), "s_nationkey")
        .filter(
            F.col("s_acctbal").cast("decimal(38,6)") * 20 > F.col("nation_total")
        )
        .select(
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.col("s_nationkey").cast("long").alias("nationkey"),
        )
    )


# ---------------------------------------------------------------------------
# zc15 — equi-depth histogram (round-6 addition): the optimizer-
# statistics primitive (ANALYZE-style column histogram) — decile
# boundaries from ONE ANSI percentile_disc aggregate (DATA values, so
# DuckDB's quantile_disc selects the identical element — the z78/t08
# convention), bucket assignment as a row-local fold against the
# broadcast 9-value boundary array, one bounded 10-row aggregate.
# No sort of the data, no window over the fact table.
# ---------------------------------------------------------------------------
_ZC15_CUTS = [i / 10 for i in range(1, 10)]


@register(
    "zg11_equidepth_histogram",
    oracle=f"""
    WITH cuts AS (
        SELECT quantile_disc(o_totalprice,
                             [{", ".join(str(c) for c in _ZC15_CUTS)}]) AS q
        FROM orders
    ),
    b AS (
        SELECT CAST(len(list_filter(q, c -> o_totalprice > c)) AS INTEGER)
                   AS bucket,
               o_totalprice AS v
        FROM orders, cuts
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(v) AS lo, MAX(v) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    description="equi-depth decile histogram: percentile_disc boundaries "
    "+ row-local bucket fold + bounded 10-row aggregate",
)
def zg11_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cuts = o.agg(
        F.array(
            *[
                F.expr(
                    f"percentile_disc({c}) WITHIN GROUP (ORDER BY o_totalprice)"
                )
                for c in _ZC15_CUTS
            ]
        ).alias("q")
    )
    b = o.crossJoin(F.broadcast(cuts)).select(
        F.aggregate(
            "q",
            F.lit(0),
            lambda acc, c: acc + (F.col("o_totalprice") > c).cast("int"),
        ).alias("bucket"),
        F.col("o_totalprice").alias("v"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# zc16 — column profile (round-6 addition): the data-quality /
# ANALYZE-TABLE summary every ingestion pipeline publishes — per
# column: nulls, exact distinct count, min/max (rendered as strings so
# one relation carries mixed types).  ONE scan computes every
# aggregate (multi-aggregate projection; count(DISTINCT x) per column
# expands via Spark's single-pass expand operator), then the one
# result row unpivots via stack into (column, metric) rows.
# ---------------------------------------------------------------------------
_ZC16_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


@register(
    "zg12_column_profile",
    oracle="""
    SELECT 'o_orderkey' AS col_name,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    """,
    description="per-column profile: nulls, exact distinct, min/max — "
    "one scan, stack-unpivoted summary row",
)
def zg12_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    aggs = []
    for c in _ZC16_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__null`, `{c}__dist`, `{c}__min`, `{c}__max`"
        for c in _ZC16_COLS
    )
    return row.select(
        F.expr(
            f"stack({len(_ZC16_COLS)}, {stack}) AS "
            "(col_name, n_null, n_distinct, min_str, max_str)"
        )
    )


# ---------------------------------------------------------------------------
# zc17 — TPC-H Q14-style promo revenue share (round-6 addition):
# conditional revenue share of 'PROMO%' parts in one ship-month — the
# CASE-inside-aggregate + broadcast-dimension join shape, with both
# the promo and total revenue as exact decimal sums and the percentage
# one IEEE division of the two rounded sums.
# ---------------------------------------------------------------------------
@register(
    "zg23_promo_revenue_share",
    oracle="""
    SELECT
      CAST(ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
                          THEN CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(38,6))
                          ELSE CAST(0 AS DECIMAL(38,6)) END), 2) AS DOUBLE)
          AS promo_revenue,
      CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_revenue,
      CAST(100.0 * CAST(ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
                          THEN CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(38,6))
                          ELSE CAST(0 AS DECIMAL(38,6)) END), 2) AS DOUBLE)
           / CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(38,6))), 2) AS DOUBLE) AS DOUBLE)
          AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1995-09-01'
      AND l_shipdate < DATE '1995-10-01'
    """,
    description="TPC-H Q14-style promo revenue share: conditional "
    "decimal-exact sums, percentage from the rounded pair",
)
def zg23_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    p = table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    agg = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(F.sum(promo), 2).cast("double").alias("promo_revenue"),
        F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (100.0 * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


# ---------------------------------------------------------------------------
# zc21 — trailing-window anomaly detection (round-6 addition): hourly
# event-volume z-scores per event type against the TRAILING 24-hour
# window (current hour excluded so a spike can't mask itself) — the
# ops-monitoring primitive over the events stream.  Determinism: the
# windowed moments are sums/sum-of-squares of INTEGER counts (exact in
# any engine); mean and variance are each ONE division of exact
# integers (var = (n·Σx² − (Σx)²) / n²), the z-score divides two
# bit-identical doubles, and the emitted z is rounded.  Hours with
# fewer than 6 trailing observations emit NULL z (insufficient
# history).  RANGE frame in hour units — the z97 time-bounded-frame
# surface put to analytic work.
# ---------------------------------------------------------------------------
@register(
    "zg14_event_volume_anomaly",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, hour, n_events,
               COUNT(*) OVER tw AS wn,
               SUM(n_events) OVER tw AS ws,
               SUM(n_events * n_events) OVER tw AS wss
        FROM hourly
        WINDOW tw AS (PARTITION BY event_type ORDER BY hour
                      RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour, n_events,
           CASE WHEN wn >= 6
                     AND CAST(wn * wss - ws * ws AS DOUBLE)
                         / CAST(wn * wn AS DOUBLE) > 0
                THEN ROUND(
                    (n_events - CAST(ws AS DOUBLE) / wn)
                    / sqrt(CAST(wn * wss - ws * ws AS DOUBLE)
                           / CAST(wn * wn AS DOUBLE)), 4)
           END AS z,
           COALESCE(
               wn >= 6
               AND CAST(wn * wss - ws * ws AS DOUBLE)
                   / CAST(wn * wn AS DOUBLE) > 0
               AND abs((n_events - CAST(ws AS DOUBLE) / wn)
                       / sqrt(CAST(wn * wss - ws * ws AS DOUBLE)
                              / CAST(wn * wn AS DOUBLE))) > 2.0,
               FALSE) AS is_anomaly
    FROM w
    """,
    description="hourly event-volume anomalies: z-score vs the trailing "
    "24h window, integer-exact moments, self-excluding frame",
)
def zg14_event_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    tw = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rangeBetween(-24, -1)
    )
    wn = F.count(F.lit(1)).over(tw)
    ws = F.sum("n_events").over(tw)
    wss = F.sum(F.col("n_events") * F.col("n_events")).over(tw)
    var = (wn * wss - ws * ws).cast("double") / (wn * wn).cast("double")
    mean = ws.cast("double") / wn
    z = (F.col("n_events") - mean) / F.sqrt(var)
    ok = (wn >= 6) & (var > 0)
    return hourly.select(
        "event_type",
        "hour",
        "n_events",
        F.when(ok, F.round(z, 4)).alias("z"),
        F.coalesce(ok & (F.abs(z) > 2.0), F.lit(False)).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# ze01 — TPC-H Q17-style small-quantity revenue (round-7 addition): for
# one brand's parts, the revenue on lineitems whose quantity is below
# 20% of that PART's average quantity — the classic correlated scalar
# subquery (avg per outer part).  Decorrelated Spark-first as ONE
# lineitem pass: broadcast-semi-reduce to the brand's parts, then a
# per-partkey WINDOW computes (sum_qty, cnt) alongside the rows — no
# second lineitem scan, no self-join (the textbook rewrite scans the
# fact twice).  The 20%-of-average threshold compares EXACT integers:
# qty * 5 * cnt < sum_qty (decimal) — no division, no float ordering.
# ---------------------------------------------------------------------------
@register(
    "zg30_small_quantity_revenue",
    oracle="""
    WITH br AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23'
    ), w AS (
        SELECT l_partkey, l_quantity, l_extendedprice,
               SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (PARTITION BY l_partkey)
                   AS sum_qty,
               COUNT(*) OVER (PARTITION BY l_partkey) AS cnt
        FROM br
    )
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE)
               AS small_qty_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM w
    WHERE CAST(l_quantity AS DECIMAL(38,6)) * 5 * cnt < sum_qty
    """,
    description="TPC-H Q17-style correlated scalar subquery, decorrelated "
    "to one fact pass via per-key window; exact integer threshold",
)
def zg30_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    br = li.join(
        F.broadcast(p.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    w = W.partitionBy("l_partkey")
    qty = F.col("l_quantity").cast("decimal(38,6)")
    br = br.withColumn("sum_qty", F.sum(qty).over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(w)
    )
    small = br.filter(qty * 5 * F.col("cnt") < F.col("sum_qty"))
    return small.agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")), 2)
        .cast("double")
        .alias("small_qty_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# ze02 — TPC-H Q22-style idle rich customers (round-7 addition):
# customers whose balance exceeds the GLOBAL average positive balance
# and who have placed no orders — the scalar-subquery (one global
# aggregate) + anti-join shape Q22 runs per country-code prefix.
# Spark-first: the global (sum, count) is ONE broadcast row
# (cross-joined, never a shuffle of the fact), the no-orders test a
# left-anti join; the above-average compare is exact decimal
# balance·count > sum — no division.
# ---------------------------------------------------------------------------
@register(
    "zg31_idle_rich_customers",
    oracle="""
    WITH g AS (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS s,
               COUNT(*) AS n
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_custkey, c_name, c_acctbal
    FROM customer, g
    WHERE c_acctbal > 0
      AND CAST(c_acctbal AS DECIMAL(38,6)) * g.n > g.s
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    description="TPC-H Q22-style scalar-subquery threshold + anti-join: "
    "above-global-average balance, no orders; broadcast one-row agg",
)
def zg31_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0)
    g = pos.agg(
        F.sum(F.col("c_acctbal").cast("decimal(38,6)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    rich = pos.crossJoin(F.broadcast(g)).filter(
        F.col("c_acctbal").cast("decimal(38,6)") * F.col("n") > F.col("s")
    )
    return rich.join(
        o.select("o_custkey"), rich.c_custkey == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


# ---------------------------------------------------------------------------
# zg47 — ordered string aggregation (LISTAGG ... WITHIN GROUP, new
# inherited SQL surface in Spark 4 / ANSI 2016): the deterministic
# ordered-concat shape — per-order CSV of its lineitem ship modes, plus
# per-region nation roster.  DuckDB twin: string_agg with ORDER BY
# (same semantics, pre-listagg spelling).
# ---------------------------------------------------------------------------
@register(
    "q33_listagg_rosters",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    description="LISTAGG WITHIN GROUP (Spark 4 inherited SQL): "
    "deterministic ordered string aggregation",
)
def q33_listagg_rosters(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("__zg47_nation")
    table(spark, sf_dir, "region").createOrReplaceTempView("__zg47_region")
    return spark.sql("""
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                   AS nations,
               COUNT(*) AS n_nations
        FROM __zg47_nation JOIN __zg47_region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """)


# ---------------------------------------------------------------------------
# zg48 — VARIANT semi-structured extraction (new Spark 4 type, the
# open-variant-ish binary JSON): nested JSON built deterministically
# from event columns (the zb20 injection convention — identical string
# expression in both engines), parsed once to VARIANT, then TYPED
# variant_get extraction — the metadata-blob access path a training
# pipeline uses for per-record provenance.  DuckDB twin: json_extract
# with casts (same paths, same types).
# ---------------------------------------------------------------------------
_ZG48_JSON = (
    "'{\"evt\": {\"type\": \"' || event_type || '\", \"user\": ' || user_id"
    " || '}, \"payload\": ' || props || '}'"
)


@register(
    "q34_variant_extract",
    oracle=f"""
    SELECT event_id,
           CAST(json_extract_string(j, '$.evt.type') AS VARCHAR) AS etype,
           CAST(json_extract(j, '$.evt.user') AS BIGINT) AS euser,
           CAST(json_extract(j, '$.payload.k') AS INTEGER) AS payload_k
    FROM (SELECT event_id, {_ZG48_JSON} AS j FROM events)
    WHERE event_id % 11 = 0
    """,
    description="VARIANT typed extraction (Spark 4 parse_json + "
    "variant_get): nested provenance-blob access, single parse per row",
)
def q34_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "events").createOrReplaceTempView("__zg48_events")
    return spark.sql(f"""
        SELECT event_id,
               variant_get(v, '$.evt.type', 'string') AS etype,
               variant_get(v, '$.evt.user', 'bigint') AS euser,
               variant_get(v, '$.payload.k', 'int') AS payload_k
        FROM (SELECT event_id, parse_json({_ZG48_JSON}) AS v
              FROM __zg48_events)
        WHERE event_id % 11 = 0
    """)


# ---------------------------------------------------------------------------
# zg49 — SQL-defined scalar UDF + session variable (both new inherited
# surfaces in Spark 4 / SQL:2016 PSM-lite): revenue function declared
# IN SQL (no Python, no JVM jar — the portable form of the reference's
# scalar function registry) applied under a session-variable threshold.
# Oracle: the function body and variable value inlined; decimal-exact
# sum (functions/det.py convention).
# ---------------------------------------------------------------------------
@register(
    "q35_sql_udf_vars",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_sql("l_extendedprice * (1 - l_discount)", "net_revenue")},
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_discount > 0.06
    GROUP BY l_returnflag
    """,
    description="SQL-defined scalar UDF + session variable (Spark 4 "
    "inherited SQL): declarative function registry, no Python/JVM code",
)
def q35_sql_udf_vars(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("__zg49_li")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION __zg49_net(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE __zg49_cut DOUBLE DEFAULT 0.05")
    spark.sql("SET VARIABLE __zg49_cut = 0.06")
    return spark.sql(f"""
        SELECT l_returnflag,
               CAST(ROUND(SUM(CAST(__zg49_net(l_extendedprice, l_discount)
                   AS DECIMAL(38,6))), 2) AS DOUBLE) AS net_revenue,
               COUNT(*) AS n_items
        FROM __zg49_li
        WHERE l_discount > __zg49_cut
        GROUP BY l_returnflag
    """)


# ---------------------------------------------------------------------------
# zg50 — TRUE correlated scalar subqueries through the SQL surface
# (Catalyst decorrelation under test — zb01 covers the same semantics
# via an explicit broadcast-join rewrite; this gate hands the analyzer
# the correlated form itself): orders priced > 1.5x their customer's
# average, with the predicate in INTEGER-MULTIPLIER decimal form
# (2·price·count > 3·sum) so membership is engine-independent — a
# literal 1.5 multiplier is rounded to scale 6 by Spark's
# precision-loss rule while DuckDB keeps the exact scale-7 product, a
# latent half-microunit tie divergence; double AVG would be
# order-sensitive in the last ulp.  Both factors stay exact decimals.
# ---------------------------------------------------------------------------
_ZG50 = """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM {orders} o
    WHERE 2 * CAST(o.o_totalprice AS DECIMAL(38,6))
          * (SELECT COUNT(*) FROM {orders} o2
             WHERE o2.o_custkey = o.o_custkey)
          > (SELECT 3 * SUM(CAST(o3.o_totalprice AS DECIMAL(38,6)))
             FROM {orders} o3 WHERE o3.o_custkey = o.o_custkey)
"""


@register(
    "q36_correlated_above_avg",
    oracle=_ZG50.format(orders="orders"),
    description="correlated scalar subqueries (decorrelation surface): "
    "orders above 1.5x their customer's average, decimal-exact predicate",
)
def q36_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__zg50_orders")
    return spark.sql(_ZG50.format(orders="__zg50_orders"))


# ---------------------------------------------------------------------------
# zg51 — TPC-H Q18 clone (large-volume customers): IN over a grouped
# HAVING subquery + a three-way join re-aggregation — the classic
# "semi join against an aggregate" plan.  Quantity sums ride the
# decimal-exact convention at both the HAVING gate and the output.
# ---------------------------------------------------------------------------
_ZG51 = """
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
               AS total_qty
    FROM {customer} c
    JOIN {orders} o ON c.c_custkey = o.o_custkey
    JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM {lineitem}
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 150
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey
"""


@register(
    "q37_large_volume_customers",
    oracle=_ZG51.format(customer="customer", orders="orders", lineitem="lineitem"),
    description="TPC-H Q18 shape: IN over grouped HAVING + 3-way join "
    "re-aggregation, decimal-exact quantity sums",
)
def q37_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("__zg51_c")
    table(spark, sf_dir, "orders").createOrReplaceTempView("__zg51_o")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("__zg51_l")
    return spark.sql(
        _ZG51.format(customer="__zg51_c", orders="__zg51_o", lineitem="__zg51_l")
    )


# ---------------------------------------------------------------------------
# zg52 — LIMIT/OFFSET pagination (OFFSET is inherited SQL new in
# Spark 3.4+): page 3 of the fully-ordered order book.  Deterministic
# because the ORDER BY is a total order (price desc, then key); the
# plan remains a TakeOrdered-class top-(limit+offset), never a global
# sort of the table.
# ---------------------------------------------------------------------------
_ZG52 = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM {orders}
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
"""


@register(
    "q38_offset_pagination",
    oracle=_ZG52.format(orders="orders"),
    description="LIMIT/OFFSET pagination over a total order (Spark 3.4+ "
    "OFFSET): top-(limit+offset) plan, no global sort",
)
def q38_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__zg52_orders")
    return spark.sql(_ZG52.format(orders="__zg52_orders"))


# ---------------------------------------------------------------------------
# zg53 — NOT IN subquery (null-aware anti-join semantics): customers
# outside every nation of one region.  Distinct from z42/zg31 (LEFT
# ANTI joins): NOT IN carries three-valued NULL semantics — one NULL in
# the subquery empties the result — so Catalyst plans it as a
# null-aware anti join unless non-nullability is proven.  The second
# branch pins exactly that trap: the same predicate over a subquery
# made nullable (NULLIF) must return zero rows in BOTH engines.
# ---------------------------------------------------------------------------
_ZG53 = """
    SELECT c_custkey, c_nationkey
    FROM {customer}
    WHERE c_nationkey NOT IN (
        SELECT n_nationkey FROM {nation} WHERE n_regionkey = 3
    )
    UNION ALL
    SELECT c_custkey, c_nationkey
    FROM {customer}
    WHERE c_nationkey NOT IN (
        SELECT NULLIF(n_nationkey, n_nationkey) FROM {nation}
        WHERE n_regionkey = 3
    )
"""


@register(
    "q39_not_in_null_semantics",
    oracle=_ZG53.format(customer="customer", nation="nation"),
    description="NOT IN subquery incl. the NULL trap: null-aware anti "
    "join; a NULL in the subquery empties that branch in both engines",
)
def q39_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("__zg53_c")
    table(spark, sf_dir, "nation").createOrReplaceTempView("__zg53_n")
    return spark.sql(_ZG53.format(customer="__zg53_c", nation="__zg53_n"))


# ---------------------------------------------------------------------------
# q40 — TPC-H Q21 structure ("suppliers who kept orders waiting"):
# EXISTS + NOT EXISTS over the SAME table, both correlated to the outer
# block — the NOT EXISTS additionally references a SECOND outer table's
# column (o.o_orderdate), the deepest same-table correlation pair in
# TPC-H.  Adapted to this schema (no l_commitdate/l_receiptdate):
# "late" = shipped more than 60 days after the order date.  LIMIT rides
# a total order (numwait desc, s_name unique).  Catalyst decorrelates
# both predicates into anti/semi joins — no per-row re-execution.
# ---------------------------------------------------------------------------
_Q40 = """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM {supplier} s
    JOIN {lineitem} l1 ON l1.l_suppkey = s.s_suppkey
    JOIN {orders} o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM {lineitem} l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM {lineitem} l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 50
"""


@register(
    "q40_waiting_suppliers",
    oracle=_Q40.format(supplier="supplier", lineitem="lineitem", orders="orders"),
    description="TPC-H Q21 structure: correlated EXISTS + NOT EXISTS over "
    "the same table (sole-late-supplier detection), two-outer-table "
    "correlation in the NOT EXISTS",
)
def q40_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "supplier").createOrReplaceTempView("__q40_s")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("__q40_l")
    table(spark, sf_dir, "orders").createOrReplaceTempView("__q40_o")
    return spark.sql(
        _Q40.format(supplier="__q40_s", lineitem="__q40_l", orders="__q40_o")
    )


# ---------------------------------------------------------------------------
# q41 — TPC-H Q20 structure ("potential part promotion"): nested IN
# subqueries whose inner block carries TWO correlated scalar aggregates
# in the HAVING clause — supplier s ships a "dominant" share of some
# widget part (share > 2x the part's average supplier share, i.e.
# sum(q)·n_suppliers > 2·total, INTEGER-exact math: quantities are
# integer-valued so the double sums and products are exact).  The
# deepest subquery nesting in TPC-H; Catalyst decorrelates the scalar
# aggregates into one grouped join, never a per-group re-scan.
# ---------------------------------------------------------------------------
_Q41 = """
    SELECT s.s_suppkey, s.s_name
    FROM {supplier} s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey FROM {lineitem} l
        WHERE l.l_partkey IN (
            SELECT p_partkey FROM {part} WHERE p_name LIKE '%widget%'
        )
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) * (
            SELECT COUNT(DISTINCT l2.l_suppkey) FROM {lineitem} l2
            WHERE l2.l_partkey = l.l_partkey
        ) > (
            SELECT 2 * SUM(l2.l_quantity) FROM {lineitem} l2
            WHERE l2.l_partkey = l.l_partkey
        )
    )
    ORDER BY s.s_suppkey
"""


@register(
    "q41_dominant_part_suppliers",
    oracle=_Q41.format(supplier="supplier", lineitem="lineitem", part="part"),
    description="TPC-H Q20 structure: nested IN + two correlated scalar "
    "aggregates in HAVING (dominant supplier share per part), "
    "integer-exact threshold",
)
def q41_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "supplier").createOrReplaceTempView("__q41_s")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("__q41_l")
    table(spark, sf_dir, "part").createOrReplaceTempView("__q41_p")
    return spark.sql(
        _Q41.format(supplier="__q41_s", lineitem="__q41_l", part="__q41_p")
    )


# ---------------------------------------------------------------------------
# q42 — modern inherited SQL sugar (Spark 3.4+/4 surfaces, all probed
# working on this runtime; QUALIFY is NOT in OSS Spark 4.1 and stays
# uncovered): GROUP BY ALL (group by every non-aggregate select item),
# ORDER BY ALL (total order over the full select list), and star
# projection pruning `* EXCEPT (...)` (DuckDB spells it EXCLUDE — the
# twin differs in keyword only).  Decimal-exact revenue per the det
# convention.
# ---------------------------------------------------------------------------
_Q42_SPARK = """
    SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                AS DOUBLE) AS revenue
    FROM (SELECT * EXCEPT (o_orderdate, o_orderpriority) FROM {orders}) o
    JOIN {customer} c ON o.o_custkey = c.c_custkey
    GROUP BY ALL
    ORDER BY ALL
"""


@register(
    "q42_modern_sql_sugar",
    oracle=_Q42_SPARK.replace("EXCEPT (", "EXCLUDE (").format(
        orders="orders", customer="customer"
    ),
    description="GROUP BY ALL + ORDER BY ALL + star-EXCEPT projection "
    "(modern inherited SQL surfaces), decimal-exact revenue",
)
def q42_modern_sql_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__q42_o")
    table(spark, sf_dir, "customer").createOrReplaceTempView("__q42_c")
    return spark.sql(
        _Q42_SPARK.format(orders="__q42_o", customer="__q42_c")
    )


# ---------------------------------------------------------------------------
# q43 — TPC-H Q2 structure ("minimum-cost supplier"): a correlated
# scalar MIN subquery used as an EQUALITY predicate that joins back to
# the minimizing rows — the select-the-argmin-by-subquery idiom (distinct
# from zg50's threshold comparison: equality keeps ALL tied minima).
# Unit price = extendedprice/quantity; IEEE division is identical across
# engines for identical inputs, so the equality match set is
# engine-independent.  Catalyst decorrelates the MIN into a grouped
# join on l_partkey (plan-pinned: no per-row re-scan).
# ---------------------------------------------------------------------------
_Q43 = """
    SELECT s.s_name, p.p_partkey, p.p_name,
           l.l_extendedprice / l.l_quantity AS unit_price
    FROM {lineitem} l
    JOIN {part} p ON p.p_partkey = l.l_partkey
    JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size <= 10
      AND l.l_extendedprice / l.l_quantity = (
          SELECT MIN(l2.l_extendedprice / l2.l_quantity)
          FROM {lineitem} l2
          WHERE l2.l_partkey = p.p_partkey
      )
    ORDER BY p.p_partkey, s.s_name
"""


@register(
    "q43_cheapest_supplier",
    oracle=_Q43.format(lineitem="lineitem", part="part", supplier="supplier"),
    description="TPC-H Q2 structure: correlated scalar MIN as an "
    "equality join-back (argmin selection, ties kept)",
)
def q43_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("__q43_l")
    table(spark, sf_dir, "part").createOrReplaceTempView("__q43_p")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("__q43_s")
    return spark.sql(
        _Q43.format(lineitem="__q43_l", part="__q43_p", supplier="__q43_s")
    )

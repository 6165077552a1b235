"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count()-style action (no driver
materialization of results beyond the aggregate row counts)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: mix of scan-agg, multi-join, window, as-of, dedup-LSH, ANN.
HEADLINE = [
    "q01_pricing_summary",
    "q03_regional_revenue",
    "z04_brand_revenue",
    "z05_forecast_revenue",
    "q07_topk_parts_per_supplier",
    "q21_sessionization",
    "q22_asof_join",
    "d02_minhash_lsh_neardup",
    "z01_simhash_fingerprint",
    "s01_ann_topk",
    "t03_token_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spark_sql_hbase_spark.session import build_spark
    from spark_sql_hbase_spark.queries import load_all

    registry = load_all()
    spark = build_spark(app_name="bench")
    # Warm the JVM so per-query times reflect execution, not first-call
    # class loading + codegen: a tiny parquet scan-filter-agg-join, plus
    # one HOF-heavy fold pipeline (interpreted-expression + window paths)
    # — both on the smoke SF, NOT the measured SF.
    warm = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    warm.join(warm.select("r_regionkey"), "r_regionkey").filter(
        "r_name IS NOT NULL"
    ).groupBy("r_name").count().collect()
    for q in ("d02_minhash_lsh_neardup", "s01_ann_topk"):
        if q in registry:
            registry[q].fn(spark, "/root/testdata/sf0.001").count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        qd = registry.get(name)
        if qd is None:
            continue
        t0 = time.perf_counter()
        df = qd.fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {times[name]}s rows={n}", file=sys.stderr)

    total = round(sum(times.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

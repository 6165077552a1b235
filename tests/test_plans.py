"""Plan-shape assertions: the scale properties the engine claims (filter
pushdown to the scan, column pruning, broadcast of dims, shuffle-free
bucketed joins) must be visible in the physical plan, not just assumed.
"""

import re

import pytest
from pyspark.sql import functions as F

from spark_sql_hbase_spark.plans.pushdown import (
    formatted_plan,
    pushed_filters,
    read_schemas,
    scan_columns,
)
from spark_sql_hbase_spark.queries import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_q06_filters_reach_parquet(spark, registry):
    df = registry["z05_forecast_revenue"].fn(spark, SF)
    joined = " ".join(pushed_filters(df))
    for frag in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
                 "GreaterThanOrEqual(l_discount", "LessThan(l_quantity"):
        assert frag in joined, joined


def test_q06_column_pruning(spark, registry):
    df = registry["z05_forecast_revenue"].fn(spark, SF)
    cols = scan_columns(df)
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}, cols


def test_q05_broadcasts_dim(spark, registry):
    plan = formatted_plan(registry["z04_brand_revenue"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    # the fact side must NOT be broadcast: only one broadcast exchange node
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1


def test_q01_partial_aggregation(spark, registry):
    """Map-side combine: HashAggregate appears in partial+final pairs."""
    plan = formatted_plan(registry["zd01_pricing_summary"].fn(spark, SF))
    assert len(re.findall(r"HashAggregate", plan)) >= 2
    assert "partial" in plan.lower() or "merge" in plan.lower() or "Final" in plan


def test_q02_topk_no_global_sort(spark, registry):
    plan = formatted_plan(registry["z02_top_orders"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no full sort


def test_whole_stage_codegen_covers_scan_agg(spark, registry):
    """Codegen spans only materialize in the FINAL adaptive plan — execute,
    then inspect the executed plan."""
    df = registry["zd01_pricing_summary"].fn(spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # "*(n)" prefixes mark whole-stage-codegen spans in the executed plan
    assert re.search(r"\*\(\d+\) (HashAggregate|ColumnarToRow|Filter)", executed), executed


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-located join (A10 analogue at query time): two tables bucketed
    on the join key sort-merge-join without any shuffle exchange."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    import shutil

    for name, df, key in (("b_lineitem", li, "l_orderkey"), ("b_orders", o, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        loc = warehouse.replace("file:", "") + f"/{name}"
        shutil.rmtree(loc, ignore_errors=True)  # stale location from prior runs
        (df.write.mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(name))
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = formatted_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan  # bucket co-location
    n = joined.count()
    assert n == spark.read.parquet(f"{SF}/lineitem.parquet").count()


def test_keyed_store_rowkey_stats_pruning(spark, tmp_path):
    """Row-key point read on the key-sorted store: every non-matching row
    group is skipped via parquet min/max (observable: pushed filter on
    row_key + key-sorted layout asserted in test_keyed_store)."""
    from spark_sql_hbase_spark.sources import fixtures
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore

    store = KeyedTableStore(spark, str(tmp_path / "wh"))
    store.create_table(fixtures.pw_test_spec())
    store.insert("pw.test", fixtures.pw_test_df(spark), overwrite=True,
                 generate_row_key=False)
    df = store.read("pw.test").filter(F.col("row_key") == "0042")
    assert "EqualTo(row_key,0042)" in " ".join(pushed_filters(df))
    schemas = read_schemas(df)
    assert all("row_key" in s for s in schemas)


def test_q35_native_session_window_operator(spark, registry):
    """F.session_window plans as the dedicated MergingSessions operator
    (partial-aggregated, ONE exchange on the grouping key) — not a window
    function or self-join rewrite."""
    plan = formatted_plan(registry["zf14_session_window_native"].fn(spark, SF))
    assert "MergingSessions" in plan
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1


def test_q40_scalar_subquery_is_broadcast(spark, registry):
    """The 1-row aggregate joins as a broadcast nested loop (never a
    shuffle); the anti join stays an equi-join (hash/merge, no cartesian
    against the big side)."""
    plan = formatted_plan(registry["zg09_waiting_customers"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan


def test_p01_pipeline_is_fused_zero_join(spark, registry):
    """The curation pipeline computes all filters row-locally: no joins,
    exactly two exchanges (dedup window on the digest + per-source
    rollup). Composing the stages by join would shuffle the text corpus
    once per stage."""
    plan = formatted_plan(registry["zd41_curation_pipeline"].fn(spark, SF))
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 2


def test_r01_range_join_is_equi_not_nested_loop(spark, registry):
    """The interval join must plan as a shuffle-parallel equi-join on the
    bucket id — never a nested-loop/cartesian over points × intervals."""
    plan = formatted_plan(registry["zb05_interval_join"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


def test_q28_no_hotkey_prepass(spark, registry):
    """Round-2 fix: the hot-key set is a parameter — the query plan must
    contain NO extra aggregation pre-pass, and the In-filter must push
    into the lineitem scan."""
    df = registry["zb03_salted_join"].fn(spark, SF)
    joined = " ".join(pushed_filters(df))
    assert "In(l_partkey" in joined, joined


def test_q37_multiformat_three_scans_no_join(spark, registry):
    """The merged roundtrip gate is three independent branches unioned —
    no join anywhere, one agg pair per branch."""
    plan = formatted_plan(registry["zb04_multiformat_roundtrip"].fn(spark, SF))
    assert "Join" not in plan, plan[:500]
    assert len(re.findall(r"\(\d+\) Union", plan)) >= 1


def test_k04_keyed_select_uses_cache_with_contains_filter(spark, registry):
    """Dot-qualified SELECT over a keyed catalog table after CACHE TABLE:
    the readback plans against the InMemoryRelation, with the LIKE
    predicate applied as a Contains filter over the cached batches."""
    df = registry["zf02_namespace_ctas_select"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "InMemoryTableScan" in plan or "Scan In-memory" in plan, plan[:800]
    assert "Contains" in plan, plan[:800]


def test_k04_like_pushes_to_parquet_without_cache(spark, tmp_path):
    """Same keyed catalog table, uncached: the LIKE predicate reaches the
    parquet scan as StringContains (the 100 TB path — you don't cache a
    100 TB table; pushdown carries the filter)."""
    from spark_sql_hbase_spark.session import EngineSession

    sess = EngineSession(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    spark.range(100).selectExpr(
        "format_string('%04d', id) AS row_key",
        "concat('v_', id) AS `A:A_00`",
    ).createOrReplaceTempView("__k04p_src")
    sess.sql("CREATE TABLE pwp.t USING keyed AS SELECT * FROM __k04p_src")
    df = sess.sql("select row_key, `A:A_00` from pwp.t where `A:A_00` like '%24%'")
    joined = " ".join(pushed_filters(df))
    assert "StringContains" in joined, joined
    sess.store.drop_table("pwp.t")


def test_band_index_join_reuses_buckets(spark):
    """The persisted LSH band index is bucketed on band_key: the
    candidate equi-join must NOT exchange the index side — only the
    incoming batch's band keys shuffle."""
    import shutil

    from pyspark.sql import functions as F2

    from spark_sql_hbase_spark.operators.dedup import (
        minhash_band_keys_arrow_text,
        persist_band_index,
    )
    from spark_sql_hbase_spark.queries import table as qtable

    docs = qtable(spark, SF, "documents")
    is_new = (F2.col("doc_id") % 17) == 0
    spark.sql("DROP TABLE IF EXISTS band_idx_t")
    loc = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "") + "/band_idx_t"
    shutil.rmtree(loc, ignore_errors=True)
    persist_band_index(docs.filter(~is_new), "doc_id", "text", "band_idx_t", buckets=8)

    bn = minhash_band_keys_arrow_text(docs.filter(is_new), "doc_id", "text")
    joined = bn.withColumnRenamed("id", "id_a").join(
        spark.table("band_idx_t").withColumnRenamed("id", "id_b"), "band_key"
    )
    plan = formatted_plan(joined)
    # exactly ONE exchange: the new-batch side; the bucketed index side
    # is read pre-partitioned
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert "Scan parquet spark_catalog.default.band_idx_t" in plan


def test_band_index_join_matches_direct(spark):
    """Index-backed incremental join == direct incremental join."""
    import shutil

    from pyspark.sql import functions as F2

    from spark_sql_hbase_spark.operators.dedup import (
        minhash_lsh_join_against_index,
        minhash_lsh_join_incremental,
        persist_band_index,
    )
    from spark_sql_hbase_spark.queries import table as qtable

    docs = qtable(spark, SF, "documents")
    is_new = (F2.col("doc_id") % 17) == 0
    new, corpus = docs.filter(is_new), docs.filter(~is_new)
    spark.sql("DROP TABLE IF EXISTS band_idx_eq")
    loc = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "") + "/band_idx_eq"
    shutil.rmtree(loc, ignore_errors=True)
    persist_band_index(corpus, "doc_id", "text", "band_idx_eq", buckets=8)
    via_index = minhash_lsh_join_against_index(
        new, spark.table("band_idx_eq"), corpus, "doc_id", "text"
    )
    direct = minhash_lsh_join_incremental(new, corpus, "doc_id", "text")
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_t08_mix_plan_has_no_window(spark, registry):
    """Round-2 weak finding: per-stream ntile funneled every document of a
    stream through ONE task.  The round-3 shape computes broadcast decile
    boundaries and buckets by range comparison — no Window operator may
    appear in either boundary mode, and the boundary side must broadcast."""
    from spark_sql_hbase_spark.operators.text import quality_mix_plan
    from spark_sql_hbase_spark.queries import table as qtable

    docs = qtable(spark, SF, "documents")
    for mode in ("exact", "approx"):
        plan = formatted_plan(
            quality_mix_plan(docs, "source", "doc_id", "text", 10, boundaries=mode)
        )
        assert "Window" not in plan, (mode, plan)
        assert "BroadcastHashJoin" in plan, (mode, plan)


def test_t08_approx_matches_exact_at_test_scale(spark):
    """At test scale the GK sketch (accuracy=10000) is exact, so the
    production approx path must produce the identical manifest to the
    oracle-checked exact path."""
    from spark_sql_hbase_spark.operators.text import quality_mix_plan
    from spark_sql_hbase_spark.queries import table as qtable

    docs = qtable(spark, SF, "documents")
    ex = quality_mix_plan(docs, "source", "doc_id", "text", 10, boundaries="exact")
    ap = quality_mix_plan(docs, "source", "doc_id", "text", 10, boundaries="approx")
    assert sorted(map(tuple, ex.collect())) == sorted(map(tuple, ap.collect()))


def test_sequence_generator_has_no_single_partition_exchange(spark):
    """Round-3: the dense-sequence row-key generator assigns keys via
    per-partition offsets (zipWithIndex shape) — the plan must contain no
    global window and no single-partition exchange, and keys must still
    be the dense zero-padded sequence."""
    from spark_sql_hbase_spark.functions.rowkey import sequence_row_key
    from spark_sql_hbase_spark.queries import table as qtable

    nat = qtable(spark, SF, "nation").repartition(4).select("n_name")
    keyed = sequence_row_key(nat, start_at=5)
    plan = formatted_plan(keyed)
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan
    keys = sorted(r.row_key for r in keyed.collect())
    n = nat.count()
    assert keys == [f"{i:04d}" for i in range(6, 6 + n)]


def test_t11_surprisal_single_corpus_scan(spark, registry):
    """Round-3 weak finding: tf/counts/total as three independent
    aggregates scanned+tokenized the corpus 3×.  The round-4 shape derives
    counts from tf and total from counts, so Catalyst's ReuseExchange
    collapses every reference onto ONE corpus scan.  (Pinned with AQE off
    — AQE performs the same reuse at runtime via stage reuse, asserted by
    the ReusedExchange count; the static AQE plan prints pre-reuse.)"""
    spark.catalog.clearCache()  # cached gate intermediates would hide the scan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = registry["zd51_unigram_surprisal"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("documents.parquet") == 1, plan
        assert plan.count("ReusedExchange") >= 2, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_t10_repetition_single_tokenize(spark, registry):
    """Round-3 minor finding: ~8 references to an aliased tokens(text)
    re-ran the interpreted tokenize per reference (CollapseProject inlines
    aliases; HOF lambdas get no subexpression elimination).  The round-4
    shape binds the token array behind a Generate barrier — the tokenize
    expression (its regexp split) must appear exactly ONCE in the plan."""
    plan = formatted_plan(registry["zd50_repetition_stats"].fn(spark, SF))
    assert plan.count("split(") == 1, plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1, plan


def test_s04_multiprobe_never_explodes_corpus(spark, registry):
    """Probe selection must multiply only the (tiny, broadcast) query
    side — a row-local array_sort over the packed centroid model then
    one nprobe explode: exactly one Generate in the whole plan, no
    ranking Window, and the corpus reaches the cell equi-join
    unexploded."""
    plan = formatted_plan(registry["zb11_ann_multiprobe"].fn(spark, SF))
    gens = re.findall(r"\(\d+\) Generate", plan)
    assert len(gens) == 1, plan
    # the only Windows allowed are the final per-query top-k (1)
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan
    assert "BroadcastHashJoin" in plan


def test_s06_ivfadc_corpus_side_is_codes_only(spark, registry):
    """IVFADC: the corpus join input must be the (cell, codes) index —
    scored via per-query ADC tables on the broadcast side.  Round 14:
    the corpus side (assignment + encode) is ONE fused Arrow
    ``MapInPandas`` pass, so its two packed-model BroadcastExchanges are
    gone; exactly three remain (packed centroids → probe selection,
    packed codebooks → distance tables, probe tables → the cell
    equi-join), plus exactly one Generate (the query-side nprobe
    explode), and the query side stays SHUFFLE-FREE up to the final
    top-k (probe selection and ADC tables are row-local projections —
    no ranking window, no aggregation exchanges)."""
    plan = formatted_plan(registry["zd46_ivfadc"].fn(spark, SF))
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 3, plan
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan


def test_ann_plan_size_bounded_in_model_size(spark):
    """Round-5 scale fix (VERDICT r4 "What's wrong" #1): ANN query-side
    model state rides broadcast RELATIONS, not plan literals.  An 8x
    bigger coarse quantizer (C=8 → 64) and an 8x bigger PQ codebook
    (ksub=8 → 64) must leave the plan's printed size essentially flat —
    the literal form grew O(C·dim) / O(m·ksub·sub) expression nodes and
    was uncompilable at production model sizes (C=4096, ksub=256)."""
    import random

    from spark_sql_hbase_spark.operators.similarity import (
        assign_cells,
        multiprobe_ann_topk,
        pq_ann_topk,
        pq_encode,
    )
    from spark_sql_hbase_spark.queries import table as qtable

    rng = random.Random(5)

    def cents(c):
        return [(i, [rng.uniform(-1.0, 1.0) for _ in range(64)]) for i in range(c)]

    def books(ksub):
        return [
            [(code, [rng.uniform(-1.0, 1.0) for _ in range(16)]) for code in range(ksub)]
            for _ in range(4)
        ]

    emb = qtable(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    small_c, large_c = cents(8), cents(64)
    # BOTH sides grow with the model: the corpus assignment (index build)
    # uses the same quantizer as the search — plan must stay flat anyway
    p_small = formatted_plan(
        multiprobe_ann_topk(assign_cells(emb, small_c), q, small_c, nprobe=2)
    )
    p_large = formatted_plan(
        multiprobe_ann_topk(assign_cells(emb, large_c), q, large_c, nprobe=2)
    )
    assert len(p_large) < 1.5 * len(p_small), (len(p_small), len(p_large))

    small_b, large_b = books(8), books(64)
    p_small = formatted_plan(pq_ann_topk(pq_encode(emb, small_b), q, small_b))
    p_large = formatted_plan(pq_ann_topk(pq_encode(emb, large_b), q, large_b))
    assert len(p_large) < 1.5 * len(p_small), (len(p_small), len(p_large))


def test_d09_index_delta_join_exchanges_delta_only(spark):
    """The full index-backed incremental near-dup path
    (minhash_lsh_join_against_index): the band-key candidate join may
    exchange ONLY the delta side — exactly one hashpartitioning exchange
    on band_key in the whole plan, and the bucketed index scan present."""
    import shutil

    from pyspark.sql import functions as F2

    from spark_sql_hbase_spark.operators.dedup import (
        minhash_lsh_join_against_index,
        persist_band_index,
    )
    from spark_sql_hbase_spark.queries import table as qtable

    docs = qtable(spark, SF, "documents")
    is_new = (F2.col("doc_id") % 17) == 0
    new, corpus = docs.filter(is_new), docs.filter(~is_new)
    spark.sql("DROP TABLE IF EXISTS band_idx_pin")
    loc = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "") + "/band_idx_pin"
    shutil.rmtree(loc, ignore_errors=True)
    persist_band_index(corpus, "doc_id", "text", "band_idx_pin", buckets=8)
    out = minhash_lsh_join_against_index(
        new, spark.table("band_idx_pin"), corpus, "doc_id", "text"
    )
    plan = formatted_plan(out)
    assert len(re.findall(r"hashpartitioning\(band_key", plan)) == 1, plan
    assert "band_idx_pin" in plan, plan


def test_t13_bigram_surprisal_consumers_hit_cache(spark, registry):
    """The bigram tf frame is the one corpus-derived intermediate; all
    four downstream consumers (per-doc join, bigram counts, context
    counts, successor-vocabulary scalar) must read it from cache —
    uncached, Catalyst rewrites each branch's sum-of-count into a direct
    count over raw rows (four distinct subtrees, ReuseExchange never
    matches) and the corpus is scanned 4x."""
    df = registry["zf19_bigram_surprisal"].fn(spark, SF)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 4, plan[:2000]
    finally:
        spark.catalog.clearCache()


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime bloom-filter join pruning (the 100 TB semi-join reduction
    for fact ⋈ filtered-dim shuffle joins): with the engine helper's
    thresholds, the probe-side scan must gain a might_contain predicate
    fed by a bloom_filter_agg over the filtered creation side."""
    from spark_sql_hbase_spark.queries import table as qtable
    from spark_sql_hbase_spark.session import enable_runtime_bloom_filters

    old = enable_runtime_bloom_filters(spark)
    save_bcast = {
        k: spark.conf.get(k)
        for k in ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
    try:
        # force a shuffle join so the bloom path (not broadcast) is used
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        li = qtable(spark, SF, "lineitem")
        o = qtable(spark, SF, "orders").filter(F.col("o_totalprice") > 400000)
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
    finally:
        for k, v in {**old, **save_bcast}.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ivfpq_index_probe_is_dynamic_partition_pruned(spark):
    """The persisted cell-partitioned IVFADC index: joining it with the
    broadcast probe set must dynamically prune the scan to probed cells
    (dynamicpruning expression on the partition column) and return the
    same top-k as searching the in-memory codes frame."""
    import re as re2

    from pyspark.sql import functions as F2

    from spark_sql_hbase_spark.operators.similarity import (
        _to_double,
        assign_cells,
        ivfadc_ann_topk,
        persist_ivfpq_index,
        pq_encode,
    )
    from spark_sql_hbase_spark.queries import table as qtable

    emb = qtable(spark, SF, "embeddings")
    seeds = sorted(
        emb.filter(F2.col("vec_id") < 8)
        .select("vec_id", _to_double(F2.col("embedding")).alias("ev"))
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cents = [(int(r["vec_id"]), list(r["ev"])) for r in seeds[:4]]
    books = [
        [(int(r["vec_id"]), list(r["ev"])[s * 16 : (s + 1) * 16]) for r in seeds]
        for s in range(4)
    ]
    spark.sql("DROP TABLE IF EXISTS ivfpq_idx_pin")
    import shutil

    loc = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "") + "/ivfpq_idx_pin"
    shutil.rmtree(loc, ignore_errors=True)
    persist_ivfpq_index(emb, cents, books, "ivfpq_idx_pin")

    queries = emb.filter(F2.col("vec_id") < 8)
    from_index = ivfadc_ann_topk(
        spark.table("ivfpq_idx_pin"), queries, cents, books, k=5, nprobe=2
    )
    plan = from_index._jdf.queryExecution().executedPlan().toString()
    assert re2.search(r"dynamicpruning", plan, re2.IGNORECASE), plan[:3000]

    cells = assign_cells(emb, cents, "vec_id", "embedding")
    direct = ivfadc_ann_topk(
        pq_encode(cells, books, "vec_id", "embedding", extra_cols=("cell",)),
        queries,
        cents,
        books,
        k=5,
        nprobe=2,
    )
    assert sorted(map(tuple, from_index.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_z57_bpe_pairs_explode_vocabulary_not_corpus(spark, registry):
    """BPE pair counting: the pair explode must consume the AGGREGATED
    word-frequency table (vocabulary cardinality), not raw corpus tokens
    — its Generate sits above the word-count exchange, and top-k is a
    TakeOrdered, never a global sort."""
    plan = formatted_plan(registry["zg20_bpe_pair_counts"].fn(spark, SF))
    gens = [int(m) for m in re.findall(r"\((\d+)\) Generate", plan)]
    assert len(gens) == 2, plan  # tokenize explode + pair explode
    exchanges = [int(m) for m in re.findall(r"\((\d+)\) Exchange", plan)]
    # formatted-plan ids grow leaf → root (lower = earlier in
    # execution): the pair explode (the LATER Generate) must sit above
    # the word-count shuffle — its id exceeds the earliest exchange's
    assert exchanges and max(gens) > min(exchanges), (gens, exchanges)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_z58_boilerplate_topk_is_partial_over_aggregated_counts(spark, registry):
    """Per-stream boilerplate hitters: the ranking window must run over
    the AGGREGATED (stream, gram) counts — never raw shingle rows — and
    get Spark's WindowGroupLimit pre-shuffle partial top-k, so the
    per-stream ranking is combiner-style at vocabulary cardinality."""
    plan = formatted_plan(registry["zg63_boilerplate_ngrams"].fn(spark, SF))
    assert "WindowGroupLimit" in plan, plan[:800]
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan[:800]
    # the (stream, gram) count aggregate sits below the window: its
    # HashAggregate has a LOWER formatted id (ids grow leaf → root, so
    # lower = earlier in execution — same convention as the t14 pin)
    win_id = int(re.search(r"\((\d+)\) Window\b", plan).group(1))
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan)]
    assert agg_ids and min(agg_ids) < win_id, (win_id, agg_ids)


def test_d10_duplicate_spans_shuffles_hashes_only(spark, registry):
    """Substring-dedup's real shuffles must carry only (id, 8-byte hash,
    count) — never text.  The single text-carrying exchange allowed is
    the RoundRobin repartition from _parallelized (test-scale artifact:
    a single small parquet file scans as one partition; a no-op at
    scale)."""
    plan = formatted_plan(registry["zg18_duplicate_spans"].fn(spark, SF))
    lines = plan.splitlines()
    matched = 0
    for i, line in enumerate(lines):
        if line.strip().startswith("Arguments: hashpartitioning"):
            # the Input [...] line above lists the exchange's columns
            inputs = lines[i - 1]
            assert "text" not in inputs, (inputs, line)
            matched += 1
    # ADVICE r4: without this the loop body can never execute under
    # formatted-explain layout drift and the test passes vacuously — the
    # hash-count and dup semi-join exchanges must both be present
    assert matched >= 2, plan


def test_t12_budget_sample_no_window_no_sort(spark, registry):
    """The token-budget sampler must stay sort-free: broadcast totals
    join + row-local gate + rollup — no Window, no range partitioning
    (the cumulative-sum formulation both would appear in funnels each
    stratum through one ordered task)."""
    plan = formatted_plan(registry["zd52_budget_sample"].fn(spark, SF))
    assert "Window" not in plan, plan[:800]
    assert "rangepartitioning" not in plan, plan[:800]
    assert "BroadcastHashJoin" in plan


def test_t14_quota_sample_window_over_candidates_only(spark, registry):
    """Exact-quota sampling: the ranking window runs over the gated
    candidate subset (broadcast threshold join BELOW the window) and
    Spark inserts WindowGroupLimit — a pre-shuffle partial top-k — so
    even the candidate ranking is combiner-style, never a full
    per-stratum sort of the corpus."""
    import re as re2

    plan = formatted_plan(registry["zf20_quota_sample"].fn(spark, SF))
    assert len(re2.findall(r"\(\d+\) Window\b", plan)) == 1, plan[:800]
    assert "WindowGroupLimit" in plan, plan[:800]
    assert "BroadcastHashJoin" in plan
    # the gate filter must sit below the window: Filter on gate < cut
    # appears before the Window node in execution order (higher node id
    # = later in formatted numbering)
    win_id = int(re2.search(r"\((\d+)\) Window\b", plan).group(1))
    join_id = int(re2.search(r"\((\d+)\) BroadcastHashJoin", plan).group(1))
    assert join_id < win_id, (join_id, win_id)


def test_z61_semantic_dedup_pair_space_cell_blocked(spark, registry):
    """SemDeDup: the candidate pair space must be blocked by a cell
    EQUI-join — never an all-pairs product over the corpus.  The only
    nested-loop joins allowed are the single-row packed-model cross
    joins of assign_cells (one per corpus branch: pair side a, pair side
    b, audit spine) — or, since round 14, the assignment runs as the
    Arrow argmin ``MapInPandas`` (driver-side model) and no nested loop
    appears at all."""
    plan = formatted_plan(registry["zg24_semantic_dedup"].fn(spark, SF))
    assert "CartesianProduct" not in plan, plan[:800]
    n_bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
    assert n_bnlj <= 3, plan[:800]
    assert n_bnlj >= 1 or "MapInPandas" in plan, plan[:800]
    # the candidate join itself is keyed on cell: some equi-join's
    # details block (the lines right after its "(n) <Join>" header)
    # names cell# in its keys
    lines = plan.splitlines()
    joins = [
        " ".join(lines[i + 1 : i + 4])
        for i, line in enumerate(lines)
        if re.match(r"\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
                    line.strip())
    ]
    assert joins and any("cell#" in j for j in joins), plan[:1200]


def test_z62_temperature_mix_single_scan_windows_above_agg(spark, registry):
    """Temperature mixture planning: ONE corpus scan; the two
    unpartitioned windows (grand total, weight normalizer) run over the
    stream-cardinality AGGREGATE — the corpus aggregate sits below every
    Window in execution order, so the single-partition exchange carries
    a handful of stream rows, never documents."""
    df = registry["zg94_temperature_mix"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 1, plan
    fplan = formatted_plan(df)
    win_ids = [int(m) for m in re.findall(r"\((\d+)\) Window\b", fplan)]
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", fplan)]
    # formatted-explain ids number leaves first: the corpus aggregate
    # (lowest HashAggregate id) must precede every Window
    assert win_ids and agg_ids, fplan[:800]
    assert min(agg_ids) < min(win_ids), (agg_ids, win_ids)


def test_z63_dsir_combine_is_broadcast_no_vocab_shuffle(spark, registry):
    """DSIR: the hashed feature space is bounded (n_buckets), so the
    per-doc combine joins tf against a BROADCAST log-ratio relation —
    the only exchanges carry (doc, feat, tf) aggregates, never a
    vocabulary- or corpus-cardinality join side.  Corpus reads: one for
    the raw tf (its feature counts derive from tf — ReuseExchange), one
    for the target subset."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = registry["zg60_dsir_importance"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("documents.parquet") == 2, plan
        assert "BroadcastHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_z64_rerank_shuffles_candidates_only(spark, registry):
    """IVFADC+refine: the exact stage joins the BROADCAST candidate list
    into the vector scan — the vector table never shuffles, and every
    hash exchange is a per-query candidate ranking (keyed on query_id,
    carrying no embedding column)."""
    plan = formatted_plan(registry["zg16_ivfadc_rerank"].fn(spark, SF))
    assert "CartesianProduct" not in plan, plan[:800]
    lines = plan.splitlines()
    matched = 0
    for i, line in enumerate(lines):
        if line.strip().startswith("Arguments: hashpartitioning"):
            assert "query_id" in line, line
            inputs = lines[i - 1]
            assert "__nv" not in inputs and "__qv" not in inputs, (inputs, line)
            matched += 1
    assert matched >= 1, plan
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2, plan


def test_z67_winnowing_is_shuffle_free(spark, registry):
    """Winnowing is row-local end to end: tokenize, k-gram hash, window
    minima, explode — NO hash/range exchange anywhere (the only Exchange
    allowed is _parallelized's RoundRobin test-scale artifact), no
    Window, no Sort.  The 100 TB story: embarrassingly parallel."""
    plan = formatted_plan(registry["zg54_winnowing_fingerprints"].fn(spark, SF))
    assert "hashpartitioning" not in plan, plan[:1200]
    assert "rangepartitioning" not in plan, plan[:1200]
    assert not re.findall(r"\(\d+\) (Window|Sort)\b", plan), plan[:1200]


def test_z68_entropy_exchanges_carry_terms_not_text(spark, registry):
    """Entropy's two shuffles are keyed by doc id and carry (id, dl,
    term[, tf]) — never the document text (the Generate barrier projects
    text away before any exchange)."""
    plan = formatted_plan(registry["zg64_token_entropy"].fn(spark, SF))
    lines = plan.splitlines()
    matched = 0
    for i, line in enumerate(lines):
        if line.strip().startswith("Arguments: hashpartitioning"):
            assert "text" not in lines[i - 1], (lines[i - 1], line)
            matched += 1
    assert matched == 2, plan[:1200]


def test_z69_canonical_selection_no_cartesian(spark, registry):
    """Keep-best selection stays equi-join/broadcast everywhere — no
    CartesianProduct and no unpartitioned Window sneaks in via the
    argmax (it is max-then-filter-then-min, not a window rank)."""
    plan = formatted_plan(registry["zg55_canonical_selection"].fn(spark, SF))
    assert "CartesianProduct" not in plan, plan[:1200]
    assert not re.findall(r"\(\d+\) Window\b", plan), plan[:1200]


def test_z70_cms_single_corpus_scan(spark, registry):
    """The sketch grid derives from the ONE per-(term,row,bucket)
    aggregate (Σ tc rollup), so both references to it collapse onto a
    single corpus scan via ReuseExchange — the t11/z63 single-scan
    discipline.  (AQE off for the static assert; AQE performs the same
    reuse at runtime.)"""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = registry["zg61_cms_heavy_hitters"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("documents.parquet") == 1, plan
        assert plan.count("ReusedExchange") >= 1, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_z71_containment_candidate_index_is_hashes_only(spark, registry):
    """Containment candidates come from the winnowing fingerprint
    inverted index: every hash exchange carries ids + the 8-byte
    selected hash (or the bounded shingle arrays on the verify side) —
    never the document text; and nothing degenerates to a cartesian."""
    plan = formatted_plan(registry["zg25_containment_neardup"].fn(spark, SF))
    assert "CartesianProduct" not in plan, plan[:1200]
    lines = plan.splitlines()
    matched = 0
    for i, line in enumerate(lines):
        if line.strip().startswith("Arguments: hashpartitioning"):
            assert "text" not in lines[i - 1], (lines[i - 1], line)
            matched += 1
    assert matched >= 2, plan[:1200]


def test_z74_oov_vocab_is_broadcast(spark, registry):
    """The vocabulary side must broadcast (bounded top-V) and the OOV
    marking join must be a BroadcastHashJoin — the corpus is never
    shuffled to be marked; exchanges never carry text."""
    plan = formatted_plan(registry["zg65_oov_rate"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:1200]
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if line.strip().startswith("Arguments: hashpartitioning"):
            assert "text" not in lines[i - 1], (lines[i - 1], line)


def test_z73_bloom_bitmap_rides_one_broadcast_row(spark, registry):
    """The Bloom gate's bitmap is ONE packed broadcast row (map of 64-bit
    words) cross-joined into the training index — a
    BroadcastNestedLoopJoin over a single row, never a shuffle; and the
    whole query keeps the d08 shape otherwise (no cartesian between
    real relations)."""
    plan = formatted_plan(registry["zg26_bloom_decontam"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan[:1200]
    assert "CartesianProduct" not in plan, plan[:1200]


def test_z75_pmi_consumers_hit_cache(spark, registry):
    """The bigram count frame is the one corpus-derived intermediate;
    both consumers (the windowed-marginal main path and the scalar
    total) must read it from cache so the corpus is tokenized once
    (t13's cache discipline).  Round 14 moved the w1/w2 marginals from
    groupBy-aggregate + re-join (four cache consumers, two SMJs) to two
    windowed long sums over the cached frame — assert the new shape:
    ≥2 cache scans, marginal windows present, and NO shuffle join
    anywhere (the only join is the one-row total broadcast)."""
    df = registry["zg95_pmi_collocations"].fn(spark, SF)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 2, plan[:2000]
        assert plan.count("Window") >= 2, plan[:2000]
        for shuffled in ("SortMergeJoin", "ShuffledHashJoin"):
            assert shuffled not in plan, plan[:2000]
    finally:
        spark.catalog.clearCache()


def test_z75_pmi_topk_is_take_ordered(spark, registry):
    """The final ranking must be TakeOrderedAndProject (partial top-k per
    partition), never a global sort of the collocation table."""
    plan = formatted_plan(registry["zg95_pmi_collocations"].fn(spark, SF))
    try:
        assert "TakeOrderedAndProject" in plan, plan[:1200]
    finally:
        spark.catalog.clearCache()


def test_z78_surprisal_buckets_no_window_boundaries_broadcast(spark, registry):
    """Tertile bucketing must stay sort/window-free: percentile_disc is
    ONE sketchless exact aggregate over the cached surprisal frame, the
    labels a row-local comparison against the broadcast scalar pair."""
    df = registry["zh08_surprisal_buckets"].fn(spark, SF)
    try:
        plan = formatted_plan(df)
        assert not re.findall(r"\(\d+\) Window\b", plan), plan[:1200]
        assert "rangepartitioning" not in plan, plan[:1200]
        assert "BroadcastNestedLoopJoin" in plan, plan[:1200]
        rt = df._jdf.queryExecution().executedPlan().toString()
        assert rt.count("InMemoryTableScan") >= 2, rt[:2000]
    finally:
        spark.catalog.clearCache()


def test_z79_line_dedup_shuffles_hashes_only(spark, registry):
    """Line-level dedup exchanges carry (id, 8-byte line hash[, count])
    — never the document text (d10's exchange contract at line
    granularity)."""
    df = registry["zg27_line_dedup_stats"].fn(spark, SF)
    try:
        plan = formatted_plan(df)
        lines = plan.splitlines()
        matched = 0
        for i, line in enumerate(lines):
            if line.strip().startswith("Arguments: hashpartitioning"):
                assert "text" not in lines[i - 1], (lines[i - 1], line)
                matched += 1
        assert matched >= 2, plan[:1500]
    finally:
        spark.catalog.clearCache()


def test_z80_strip_text_never_exchanged(spark, registry):
    """The cleaned-corpus transformation must keep document text out of
    every exchange: the only hash exchange is the flagged-set aggregate
    (8-byte line hashes), and the flagged map rides a single-row
    BroadcastNestedLoopJoin into the row-local filter."""
    plan = formatted_plan(registry["zh10_boilerplate_strip"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan[:1200]
    lines = plan.splitlines()
    matched = 0
    for i, line in enumerate(lines):
        if line.strip().startswith("Arguments: hashpartitioning"):
            assert "text" not in lines[i - 1], (lines[i - 1], line)
            matched += 1
    assert matched >= 1, plan[:1500]


def test_z81_index_scan_pushes_key_range(spark, registry):
    """The covered-index query's value predicate becomes a row-key RANGE
    on the index table, and that range must reach the parquet scan
    (row-group skipping over the key-sorted layout = the A4 fast path
    serving a VALUE predicate)."""
    df = registry["zf03_secondary_index"].fn(spark, SF)
    joined = " ".join(pushed_filters(df))
    assert "GreaterThanOrEqual(row_key,00005|" in joined, joined
    assert "LessThan(row_key,00005}" in joined, joined


def test_z83_salted_scan_pushes_or_of_ranges(spark, registry):
    """The salted range scan's OR-of-B-ranges predicate must reach the
    parquet scan as an Or filter tree over row_key bounds — that is what
    lets row-group stats skip everything outside all B stripes."""
    df = registry["zf05_salted_key_range"].fn(spark, SF)
    joined = " ".join(pushed_filters(df))
    assert "Or(" in joined and "row_key,00|0000001000" in joined, joined
    assert "row_key,07|0000002000" in joined, joined


def test_z82_asof_read_is_window_free(spark, registry):
    """The latest-per-key reduction must be filter + max aggregate +
    equi-join — never a per-key Window (which would funnel every key's
    versions through ordered tasks) and never max_by (partition-order-
    dependent ties)."""
    plan = formatted_plan(registry["zf04_versioned_asof_read"].fn(spark, SF))
    assert not re.findall(r"\(\d+\) Window\b", plan), plan[:1200]
    assert "max_by" not in plan, plan[:1200]


def test_z89_resample_single_scan_one_window(spark, registry):
    """Gap filling reads the events input ONCE — the cached per-bucket
    aggregate feeds both the span rollup and the fill join (column
    pruning makes the two subtrees non-reusable uncached, so this is
    t13's cache discipline) — and uses exactly one Window: the per-key
    forward fill."""
    df = registry["zg59_resample_ffill"].fn(spark, SF)
    try:
        plan = formatted_plan(df)
        assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan[:1500]
        assert plan.count("events.parquet") == 1, plan[:1500]
    finally:
        spark.catalog.clearCache()


def test_index_lookup_prefix_range_reaches_scan(spark, tmp_path):
    """index_lookup must plan as a parquet range scan on the index key
    (PushedFilters carries the prefix bounds), so the sorted layout's
    row-group stats and region pruning serve the point query — never a
    full index scan with a post-filter."""
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore

    st = KeyedTableStore(spark, str(tmp_path / "wh"))
    st.ctas(
        TableSpec(namespace="ip", name="t", key_type="string",
                  families={"c": {"g": "long"}}),
        spark.createDataFrame(
            [(f"{i:06d}", i % 5) for i in range(100)],
            "row_key string, `c:g` long",
        ),
    )
    st.create_covered_index("ip.t", "ip.by_g", index_col="c:g", key_width=4)
    plan = formatted_plan(st.index_lookup("ip.by_g", 3))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(row_key,0003|" in plan, plan
    assert "LessThan(row_key,0003}" in plan, plan


def test_zc05_lateral_is_decorrelated_not_nested_loop(spark, registry):
    """The correlated LATERAL (ORDER BY ... LIMIT) must decorrelate into
    a ranked window + equi-join — a per-outer-row nested-loop
    re-execution would be quadratic at scale."""
    plan = formatted_plan(registry["zg05_lateral_topk"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan, plan


def test_zc06_zc07_single_corpus_scan(spark, registry):
    """The funnel and cohort operators each read events ONCE: the funnel
    chains stages through per-user time arrays in one aggregation; the
    cohort matrix derives the cohort week via a window min over the
    distinct pairs instead of a self-join (which would re-scan)."""
    spark.catalog.clearCache()
    for name in ("zg06_event_funnel", "zg07_retention_cohorts"):
        plan = formatted_plan(registry[name].fn(spark, SF))
        assert plan.count("events.parquet") == 1, (name, plan)


def test_zc20_sliding_chunks_no_python_in_plan(spark, registry):
    """The sliding-window chunker is the PRODUCTION chunking shape: the
    whole one-to-many expansion must stay in JVM expressions — no
    Python eval operator anywhere in the plan."""
    plan = formatted_plan(registry["zg15_sliding_chunks"].fn(spark, SF))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Generate" in plan, plan


def test_ze01_q17_single_lineitem_scan(spark, registry):
    """ze01's Q17 decorrelation claim: the per-part average threshold is
    computed by a WINDOW over the same rows, not the textbook self-join
    rewrite — the fact table must be scanned exactly once."""
    plan = (
        registry["zg30_small_quantity_revenue"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("lineitem.parquet") == 1, plan
    assert "Window" in plan, plan


def test_ze02_scalar_subquery_is_broadcast(spark, registry):
    """ze02's global-average threshold is ONE broadcast row joined to
    the customer side — no shuffle of the fact for the scalar, and the
    no-orders test is a broadcast anti-join at this scale."""
    plan = formatted_plan(registry["zg31_idle_rich_customers"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_declared_region_layout_is_one_jvm_exchange(spark, tmp_path):
    """The declared split-key router must stay DataFrame-land: exactly
    one hash Exchange (region token), zero Python evaluation, zero
    extra shuffles — the 100 TB write-path law for pre-split tables."""
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore

    store = KeyedTableStore(spark, str(tmp_path / "wh"))
    spec = TableSpec(
        namespace="pl",
        name="routed",
        key_type="string",
        families={"cf": {"v": "long"}},
        split_keys=["b", "c"],
    )
    store.create_table(spec)
    df = spark.range(100).select(
        F.concat(F.lit("a"), F.col("id").cast("string")).alias("row_key"),
        F.col("id").alias("cf:v"),
    )
    plan = store._region_layout(spec, df)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Exchange rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_r11_sq8_ann_is_broadcast_only(spark, registry):
    """zg35: SQ8 scoring must be a corpus scan x broadcast queries
    (cosine_topk's shape) — no shuffle joins anywhere.  Pre-round-14 the
    scoring rode broadcast nested loops (one-row bounds join +
    query-set theta join); the round-14 Arrow scorer closes the bounds
    and queries over driver-side literals, so the plan is a single
    corpus ``MapInPandas`` with no join at all.  Either shape keeps the
    100 TB property: the corpus is never shuffle-joined."""
    plan = formatted_plan(registry["zh05_sq8_ann"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "MapInPandas" in plan
    for shuffled in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert shuffled not in plan, shuffled


def test_r11_outliers_is_broadcast_only(spark, registry):
    """s14: both stat joins ride one-row broadcasts; vectors never
    shuffle."""
    plan = formatted_plan(registry["s14_embedding_outliers"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    for shuffled in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert shuffled not in plan, shuffled


def test_r11_tfidf_pair_join_is_equi_not_nested_loop(spark, registry):
    """zg37: the posting-list self-join must be an EQUI join on term —
    a nested-loop/cartesian pair join would be the all-pairs quadratic
    plan the inverted index exists to avoid.  (The one-row n_docs
    broadcast is the only legitimate nested loop.)"""
    plan = formatted_plan(registry["d20_tfidf_cosine"].fn(spark, SF))
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert "CartesianProduct" not in plan
    # the cached (doc, term, tf) aggregate feeds all consumers: the scan
    # side shows the InMemoryRelation, not four re-tokenizing scans
    assert "InMemoryTableScan" in plan


def test_r11_kmeans_final_step_is_broadcast_only(spark, registry):
    """zg38: the returned Lloyd step must keep kmeans_step's shape —
    model-local assignment, no shuffle join of vectors.  Pre-round-14:
    packed-model broadcast nested loop; round 14: the driver-side list
    model assigns via the Arrow argmin ``MapInPandas``.  Either way the
    only exchange is the K·dim averaging aggregate."""
    plan = formatted_plan(registry["s15_kmeans_lloyd"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "MapInPandas" in plan
    for shuffled in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert shuffled not in plan, shuffled


def test_r11_correlated_subqueries_decorrelate(spark, registry):
    """zg50 hands Catalyst the correlated form — the physical plan must
    be decorrelated into aggregate+join, never a per-row subquery
    (no nested-loop/cartesian, and the correlated aggregates appear as
    plan-level HashAggregates)."""
    plan = formatted_plan(registry["q36_correlated_above_avg"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert len(re.findall(r"HashAggregate", plan)) >= 2


def test_r11_offset_pagination_no_global_sort(spark, registry):
    """zg52: ORDER BY + LIMIT/OFFSET must stay a top-(limit+offset)
    TakeOrdered plan — a global table sort would break the documented
    scale property silently."""
    plan = formatted_plan(registry["q38_offset_pagination"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_r11_shard_plan_sorts_metadata_only(spark, registry):
    """zg40's scale claims, r12 distributed-rank edition:
    (a) the rank is DISTRIBUTED — an `Exchange rangepartitioning` on the
        sort key spreads the metadata, and NO SinglePartition exchange
        appears anywhere (the r11 single-task global window is gone);
    (b) the ranked relation is the (id, n_tokens) METADATA — the text
        column is projected away before the range exchange (a sort
        carrying document bytes would be the scale-killer the operator
        exists to avoid);
    (c) the per-partition offsets join is a broadcast.

    r13: the metadata relation is pinned by an eager localCheckpoint
    (lineage truncation — boundary re-sampling impossible), which hides
    the range exchange from the RESULT's explain; the exchange shape is
    pinned on the exposed pre-checkpoint relation instead."""
    import re as _re

    from spark_sql_hbase_spark.operators.packing import _rank_partitioned_meta
    from spark_sql_hbase_spark.queries import table

    docs = table(spark, SF, "documents")
    pre = formatted_plan(_rank_partitioned_meta(docs, "doc_id", "text", 32))
    # the range exchange must carry exactly the two metadata columns —
    # a sort carrying document bytes would be the scale-killer
    ms = _re.findall(
        r"\(\d+\) Exchange\nInput \[(\d+)\]: \[([^\]]*)\]"
        r"\nArguments: rangepartitioning\(n_tokens",
        pre,
    )
    assert ms, pre[:2000]
    for n_cols, cols in ms:
        assert int(n_cols) == 2, (n_cols, cols)
        assert "text" not in cols, cols
    assert "SinglePartition" not in pre, pre[:2000]

    plan = formatted_plan(registry["p09_shard_plan"].fn(spark, SF))
    assert "SinglePartition" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan
    # local rank runs per range partition: the window is partitioned
    # (hash on pid), never a global single-partition sort
    assert _re.search(r"hashpartitioning\(pid", plan), plan[:2000]


def test_r11_quality_psi_no_corpus_sort_or_udf(spark, registry):
    """zg42: boundaries via ONE percentile aggregate, buckets row-local
    — no global sort of the corpus, no Python in the plan."""
    plan = formatted_plan(registry["t31_quality_psi"].fn(spark, SF))
    assert "Exchange rangepartitioning" not in plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert py not in plan, py


def test_r12_q21_structure_decorrelates_to_joins(spark, registry):
    """q40: the correlated EXISTS / NOT EXISTS pair must decorrelate to
    semi/anti hash joins — a per-row subquery re-execution (cartesian or
    nested-loop against lineitem) would be quadratic in the fact table."""
    plan = formatted_plan(registry["q40_waiting_suppliers"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert re.search(r"Join LeftSemi|LeftSemi", plan), plan[:1500]
    assert re.search(r"LeftAnti", plan), plan[:1500]


def test_r12_q20_structure_decorrelates_scalar_aggs(spark, registry):
    """q41: the two correlated scalar aggregates in HAVING must
    decorrelate into grouped joins on l_partkey — never a per-group
    re-scan (no cartesian, no nested-loop against lineitem)."""
    plan = formatted_plan(registry["q41_dominant_part_suppliers"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


def test_r12_vocab_kl_bounded_shuffle_no_udf(spark, registry):
    """t33: the vocabulary rides a broadcast (bucket mapping before the
    stream aggregate — the corpus vocabulary never rides a per-stream
    shuffle); no corpus sort, no Python in the plan."""
    plan = formatted_plan(registry["t33_vocab_kl_drift"].fn(spark, SF))
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan
    for py in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert py not in plan, py


def test_r12_epoch_shuffle_is_per_shard_windows(spark, registry):
    """p10: pos is windowed PER SHARD — the plan must exchange by
    hash(shard_id) and never contain a single-partition or range
    exchange (a global rank would be the shard_plan r11 weakness
    reintroduced)."""
    plan = formatted_plan(registry["p10_epoch_shuffle_plan"].fn(spark, SF))
    assert "SinglePartition" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert re.search(r"hashpartitioning\(shard_id", plan), plan[:1500]


def test_r12_scan_page_pushes_cursor_and_takeordered(spark, tmp_path):
    """scan_page (k31): the key cursor must push into the parquet scan
    (GreaterThan on row_key) and the sort+limit must plan as a
    TakeOrdered top-k — never a global table sort; deep pages cost the
    same as page one."""
    from spark_sql_hbase_spark.sources import fixtures
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore

    store = KeyedTableStore(spark, str(tmp_path / "wh"))
    store.create_table(fixtures.pw_test_spec())
    store.insert("pw.test", fixtures.pw_test_df(spark), overwrite=True,
                 generate_row_key=False)
    df = store.scan_page("pw.test", 5, after_key="0042")
    assert "GreaterThan(row_key,0042)" in " ".join(pushed_filters(df))
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_r13_versioned_scan_page_pushes_both_bounds(spark, tmp_path):
    """Versioned scan_page (k33): the returned page reads with BOTH
    key bounds pushed into the parquet scan (cursor exclusive, page
    boundary inclusive) — a deep page scans only its key range, never
    the table."""
    from spark_sql_hbase_spark.catalog import TableSpec
    from spark_sql_hbase_spark.sources.keyed_parquet import KeyedTableStore

    store = KeyedTableStore(spark, str(tmp_path / "wh"))
    spec = TableSpec(
        namespace="pg", name="verp", key_type="string",
        families={"cf": {"v": "long", "ts": "long"}},
        properties={"versions": "9", "version_column": "cf:ts"},
    )
    store.create_table(spec)
    store.insert(
        "pg.verp",
        spark.createDataFrame(
            [(f"k{i:03d}", i, v) for i in range(10) for v in (1, 2)],
            "row_key string, `cf:v` long, `cf:ts` long",
        ),
        generate_row_key=False,
    )
    df = store.scan_page("pg.verp", 3, after_key="k002")
    pushed = " ".join(pushed_filters(df))
    assert "GreaterThan(row_key,k002)" in pushed, pushed
    m = re.search(r"LessThanOrEqual\(row_key,(k\d+)\)", pushed)
    assert m, pushed
    # the boundary is at most the page_size-th key (a file-span cap may
    # close the page SHORT — documented; it must still make progress)
    assert "k002" < m.group(1) <= "k005", pushed
    keys = {r["row_key"] for r in df.collect()}
    assert 1 <= len(keys) <= 3 and min(keys) == "k003", keys


def test_r12_q2_structure_decorrelates_min_to_grouped_join(spark, registry):
    """q43: the correlated scalar MIN must decorrelate into a grouped
    aggregate joined on l_partkey — never a per-row re-scan of lineitem
    (no cartesian, no nested loop against the fact table)."""
    plan = formatted_plan(registry["q43_cheapest_supplier"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert re.search(r"HashAggregate.*min|min.*HashAggregate", plan, re.DOTALL)


def test_r13_rrf_fuse_no_join_no_corpus_rescan(spark, registry):
    """t34: fusion consumes retriever OUTPUT — the fused relation is a
    UNION + one aggregate + a per-query window; a join-based fusion (or
    a cartesian) would re-associate candidate lists the expensive way
    and break the bounded-union cost law.  The ranking window must be
    partitioned (per query), never a global single-partition sort."""
    from spark_sql_hbase_spark.operators.ranking import rrf_fuse

    lex = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "query_id int, doc_id int, rank int"
    )
    sem = spark.createDataFrame(
        [(0, 2, 1), (0, 3, 2)], "query_id int, doc_id int, rank int"
    )
    plan = formatted_plan(rrf_fuse([lex, sem], k=60, topk=2))
    assert "Join" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    assert "Union" in plan
    assert re.search(r"hashpartitioning\(query_id", plan), plan[:1500]


def test_r13_doc_repetition_no_corpus_global_state(spark, registry):
    """t35: both repetition branches aggregate keyed BY DOCUMENT — no
    corpus-global relation exists (no broadcast of a vocabulary, no
    window, no global sort); the only join is the per-doc stats merge
    on id."""
    plan = formatted_plan(registry["t35_doc_repetition"].fn(spark, SF))
    assert "Window" not in plan, plan[:1500]
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_r14_doc_repetition_gopher_no_corpus_global_state(spark, registry):
    """zh12: the paragraph branch and both gram branches aggregate
    keyed BY DOCUMENT — no corpus-global relation exists (no broadcast
    vocabulary, no window, no global sort); the only joins are the
    per-doc stats merges on id."""
    plan = formatted_plan(registry["zh12_doc_repetition_gopher"].fn(spark, SF))
    assert "Window" not in plan, plan[:1500]
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_r14_serving_scan_prunes_tail_partitions_no_exchange(spark, tmp_path):
    """The compacted-index serving read stays O(new tail) at any stream
    lifetime: two parquet scans + union, NO exchange, and the tail
    filter reaches the scan as a PartitionFilter on the batch_id
    discovery column (planning-time directory pruning past the fold
    watermark)."""
    from spark_sql_hbase_spark.streaming.pipelines import (
        bootstrap_base_snapshot,
        fold_streamed_tail,
        idempotent_batch_commit,
        serving_scan,
    )

    base = str(tmp_path / "base")
    tail = str(tmp_path / "tail")
    bootstrap_base_snapshot(
        spark.range(5).selectExpr("id", "id * 2 AS v"), base
    )
    idempotent_batch_commit(
        spark.range(3).selectExpr("id", "id AS v"), tail, 0
    )
    assert fold_streamed_tail(spark, base, tail) is True
    idempotent_batch_commit(
        spark.range(2).selectExpr("id", "id AS v"), tail, 1
    )
    plan = formatted_plan(serving_scan(spark, base, tail))
    assert "Exchange" not in plan, plan[:1500]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2, plan[:1500]
    assert re.search(r"PartitionFilters:.*batch_id.* > 0", plan), plan[:1500]
    # the base side reads ONLY the newest generation's directory
    assert "gen-1-through-0" in plan and "gen-0-through--1" not in plan


def test_r14_c4_line_clean_is_shuffle_free(spark, registry):
    """zh16: C4 line cleaning is a pure row-local projection — no
    exchange, no aggregate, no join anywhere in the plan; the corpus
    scan is the only node that touches data."""
    plan = formatted_plan(registry["zh16_c4_line_clean"].fn(spark, SF))
    assert "Exchange" not in plan, plan[:1500]
    assert "Join" not in plan and "Aggregate" not in plan


def test_q07_two_exchange_agg_then_window(spark, registry):
    """q07's agg-then-window keeps exactly two exchanges with the
    WindowGroupLimit partial->final pair (r14 VERDICT item 6): the
    partial aggregate shrinks BOTH exchanges ~7.5x at the real TPC-H
    lineitem/partsupp = 7.5 rows-per-pair distribution (a table-ratio
    constant, SF-independent), which is the 100 TB-correct trade even
    though the pairs are ~unique in this synthetic data.  Executed
    (final AQE) plan, since WindowGroupLimit placement is what's
    defended; measured exchange cardinalities recorded in
    plans/r15/q07_topk_parts_per_supplier_executed.txt."""
    df = registry["zd07_topk_parts_per_supplier"].fn(spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan"
    # section — pin the FINAL plan only
    executed = executed.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning", executed)) == 2, executed
    assert "Exchange rangepartitioning" not in executed  # no global sort
    limits = re.findall(r"WindowGroupLimit.*?(Partial|Final)", executed)
    assert "Partial" in limits and "Final" in limits, executed
    # the window exchange is keyed on the supplier alone (top-k per group)
    assert re.search(r"Exchange hashpartitioning\(l_suppkey", executed), executed

"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token statistics, document fingerprinting.

All hot-path expressions are JVM built-ins (split/filter/aggregate/regexp)
— no Python in the row path — so they run inside whole-stage codegen and
scale linearly with input bytes. Each has an exact ANSI-SQL twin used by
the correctness oracle (see queries/llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_sql_hbase_spark.functions.texthash import (
    STOPWORDS,
    rolling_hash,
    stopword_count,
    token_chars,
    token_count,
    tokens,
    word_hash,
)

# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation.
BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over a TEXT column — one
    alternation-regex pass per language (round 14: previously an
    interpreted HOF filter per language over a token array each
    reference of which re-ran the tokenizer)."""
    return {lang: stopword_count(text, lang) for lang in STOPWORDS}


def lang_pred(score_cols: dict[str, Column]) -> Column:
    """Argmax language with deterministic alphabetical tie-break; 'und'
    when no stopword hits at all."""
    g = F.greatest(*[score_cols[lang] for lang in sorted(score_cols)])
    pred = F.when(g == 0, F.lit("und"))
    for lang in sorted(score_cols):  # alphabetical order = tie-break
        pred = pred.when(score_cols[lang] == g, F.lit(lang))
    return pred


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-vote language ID over a fixed language set.

    Scores = count of language-stopword occurrences in the token stream;
    prediction = argmax with deterministic alphabetical tie-break, 'und'
    when no stopword hits at all.
    """
    scores = lang_scores(F.col(text_col))
    out = df.select(
        F.col(id_col),
        *[scores[lang].alias(f"s_{lang}") for lang in sorted(STOPWORDS)],
    )
    named = {lang: F.col(f"s_{lang}") for lang in sorted(STOPWORDS)}
    return out.select(id_col, *[f"s_{lang}" for lang in sorted(STOPWORDS)],
                      lang_pred(named).alias("pred_lang"))


def quality_expr(text_col: str) -> Column:
    """The composite quality score as a single row-local expression:
    min(1, n_tok/100) - 0.5*min(1, n_punct/d) + 0.5*sw/d over
    d = max(n_tok, 1), as ONE integer-ratio IEEE division (bit-identical
    across engines — decimal rounding of doubles is tie-unstable).

    Round 14: every term is a codegen'd ``regexp_count`` over the text —
    the token array (and the Generate barrier callers used to erect so
    its multiple references wouldn't re-tokenize) is gone from the
    PROJECT-shaped consumers.  FILTER-shaped consumers use
    :func:`quality_expr_tokens`, which measures faster there; the twins
    are bit-equality-pinned."""
    n_tok = token_count(text_col)
    n_punct = F.regexp_count(F.col(text_col), F.lit("[^A-Za-z0-9\\s]"))
    sw = stopword_count(F.col(text_col), "en")
    d = F.greatest(n_tok, F.lit(1))
    num = (
        F.lit(2) * d * F.least(n_tok, F.lit(100))
        - F.lit(100) * F.least(n_punct, d)
        + F.lit(100) * sw
    )
    return num.cast("double") / (F.lit(200) * d)


def quality_expr_tokens(text_col: str, tok: Column) -> Column:
    """The token-array twin of :func:`quality_expr`: same integers, same
    single IEEE division, computed from a token array the CALLER binds
    (one tokenize feeding n_tok and the stopword filter).  Measurably
    faster than the regex form in fused FILTER shapes (round 14: the
    curation pipeline's language+quality gate ran 0.99 vs 1.74 median
    with the regex form); the regex form wins in project shapes.
    Bit-equality between the twins is pinned by
    ``test_quality_expr_regex_matches_token_form``."""
    from spark_sql_hbase_spark.functions.texthash import stopword_count_tokens

    n_tok = F.size(tok)
    n_punct = F.regexp_count(F.col(text_col), F.lit("[^A-Za-z0-9\\s]"))
    sw = stopword_count_tokens(tok, "en")
    d = F.greatest(n_tok, F.lit(1))
    num = (
        F.lit(2) * d * F.least(n_tok, F.lit(100))
        - F.lit(100) * F.least(n_punct, d)
        + F.lit(100) * sw
    )
    return num.cast("double") / (F.lit(200) * d)


def lang_scores_tokens(tok: Column) -> dict[str, Column]:
    """Token-array twin of :func:`lang_scores` (see
    :func:`quality_expr_tokens` for when to prefer it)."""
    from spark_sql_hbase_spark.functions.texthash import stopword_count_tokens

    return {lang: stopword_count_tokens(tok, lang) for lang in STOPWORDS}


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features + a composite score.

    Features: char count, token count, mean token length, punctuation
    count, stopword ratio. Score is a bounded linear combination — the
    point is the deterministic, partition-parallel plumbing, not the
    specific weights.
    """
    # round 14: all features are codegen'd regexp_count passes over the
    # text — no token array, no interpreted fold/filter, and no risk of
    # CollapseProject re-running a tokenizer per reference
    n_tok = token_count(text_col)
    tok_chars = token_chars(text_col)
    n_punct = F.regexp_count(F.col(text_col), F.lit("[^A-Za-z0-9\\s]"))
    sw = stopword_count(F.col(text_col), "en")
    # Every ratio is ONE IEEE division of exact integers — no decimal
    # rounding anywhere, so any engine computes the bit-identical double
    # (decimal rounding of doubles is tie-unstable across engines).
    mean_tok_len = F.when(n_tok > 0, tok_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tok > 0, sw.cast("double") / n_tok).otherwise(F.lit(0.0))
    score = quality_expr(text_col)
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars_actual"),
        n_tok.cast("long").alias("n_tokens"),
        mean_tok_len.alias("mean_tok_len"),
        n_punct.cast("long").alias("n_punct"),
        sw_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


def ws_token_count(text_col: str) -> Column:
    """Whitespace token count as a row-local expression.

    Round 14 negative result (measured, kept as-is): the "cleaner"
    ``regexp_count(text, '\\S+')`` single-pass form — provably equal
    (``test_ws_token_count_regex_matches_filter`` pins the law) — was
    ~14% SLOWER than this split+filter form in interleaved A/B on the
    real corpus (0.498 vs 0.435 median): the JVM's ``split`` + a trivial
    per-piece interpreted ``!= ''`` beats full regex match iteration
    here.  The parity pin stays so the regex twin remains available."""
    return F.size(
        F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != "")
    ).cast("long")


def bpe_token_count(text_col: str) -> Column:
    """BPE-ish sub-token count as a row-local expression."""
    return F.regexp_count(F.col(text_col), F.lit(BPE_RE)).cast("long")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish sub-token count + distinct words."""
    tok = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        ws_token_count(text_col).alias("n_ws_tokens"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
        F.size(F.array_distinct(tok)).cast("long").alias("n_distinct_words"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint of the token stream."""
    return df.select(
        F.col(id_col), rolling_hash(tokens(F.col(text_col))).alias("fp")
    )


def vocabulary(
    df: DataFrame, text_col: str, top_k: int = 1000, min_count: int = 1
) -> DataFrame:
    """Corpus vocabulary with counts — the tokenizer-training prep step
    (top-V candidate list for BPE/unigram training, OOV-rate studies).

    Plan: tokenize once per doc (single-reference), explode, one
    map-side-combined count per term, top-k via TakeOrdered (no global
    sort).  The shuffle carries (term, partial_count) pairs — at 100 TB
    that is the corpus VOCABULARY (Heaps-law sublinear), not the corpus;
    per-executor partial maps keep hot terms combined before exchange.
    Deterministic tiebreak: count desc, then term asc.
    """
    from spark_sql_hbase_spark.functions.texthash import tokens

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    from pyspark.sql import Window as W

    top = counts.orderBy(F.col("n").desc(), F.col("term")).limit(top_k)
    # rank assignment runs over the ≤ top_k surviving rows only
    return top.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.col("n").desc(), F.col("term"))).cast("int"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str, top_k: int = 50, min_count: int = 1
) -> DataFrame:
    """Adjacent-symbol pair frequencies over the corpus — the counting
    step of one BPE merge iteration (Sennrich et al. 2016, "Neural
    Machine Translation of Rare Words with Subword Units", public): the
    top pair is the next merge a BPE trainer would apply.  Pairs are
    2-char substrings at every position within a word, weighted by the
    word's corpus frequency (every occurrence of "aaa" contributes two
    "aa" pairs).  Emits (pair, n, rank), count desc, pair-asc tiebreak.

    Plan shape (scales to 100 TB): ONE corpus scan builds the word-
    frequency table (map-side-combined — the shuffle carries the
    VOCABULARY, Heaps-law sublinear, not the corpus); the pair explode
    then runs over DISTINCT words only (vocabulary cardinality ×
    word length — O(10⁶·10) rows regardless of corpus size, the
    classic BPE-training trick), one more vocabulary-sized count, and a
    TakeOrdered top-k.  No UDF anywhere; the position enumeration is a
    ``sequence``/``transform`` pair per distinct word.
    """
    from spark_sql_hbase_spark.functions.texthash import tokens

    wc = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    pairs = wc.filter(F.length("word") >= 2).select(
        "wf",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    counts = (
        pairs.groupBy("pair")
        .agg(F.sum("wf").cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    from pyspark.sql import Window as W

    top = counts.orderBy(F.col("n").desc(), F.col("pair")).limit(top_k)
    return top.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.col("n").desc(), F.col("pair"))).cast("int"),
    )


def boilerplate_ngrams(
    df: DataFrame,
    group_col: str,
    id_col: str,
    text_col: str,
    n: int = 5,
    k: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Per-stream boilerplate detection: the top-``k`` ``n``-gram
    shingles by DOCUMENT FREQUENCY within each stream — the "most common
    lines/spans" analysis a web-corpus curation pass runs to find
    navigation chrome, license banners, and template text worth
    stripping (the C4/RefinedWeb boilerplate heuristic, at shingle
    granularity).  Emits (stream, gram, df, rank), df desc, gram-asc
    tiebreak, df ≥ ``min_df``.

    Plan shape (scales to 100 TB): one corpus scan explodes DISTINCT
    shingles per doc (so df counts documents, not occurrences), one
    map-side-combined (stream, gram) count — the shuffle carries the
    per-stream shingle vocabulary, Heaps-sublinear — then the per-stream
    top-k window runs over aggregated counts with Spark's
    WindowGroupLimit partial top-k (combiner-style; never a full sort of
    the vocabulary, same pinned shape as the quota sampler)."""
    from spark_sql_hbase_spark.functions.texthash import shingles, tokens

    grams = df.select(
        F.col(group_col).alias("stream"),
        F.col(id_col).alias("id"),
        F.explode(shingles(tokens(F.col(text_col)), n)).alias("gram"),
    )
    counts = grams.groupBy("stream", "gram").agg(
        F.count(F.lit(1)).alias("df")
    ).filter(F.col("df") >= min_df)
    from pyspark.sql import Window as W

    w = W.partitionBy("stream").orderBy(F.col("df").desc(), F.col("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("stream", "gram", "df", "rank")
    )


# -- PII detection / redaction ----------------------------------------------
# Conservative patterns that parse identically under Java regex (Spark)
# and RE2 (DuckDB): plain character classes, no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
}


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII hit counts + redacted text length — the standard
    pre-training scrub step (detect, count for audit, strip).

    Pure JVM regexp expressions (regexp_count / regexp_replace), one
    projection — no shuffle, no UDF; the per-source audit rollup
    downstream is a map-side-combined aggregate.
    """
    cols = [F.col(id_col), F.col(text_col)]
    red = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        cols.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, f"<{name}>")
    cols.append(F.length(red).alias("redacted_len"))
    return df.select(*cols)


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021
    'Scaling Language Models' §A1.1 quality heuristics, public):

    - ``dup_token_frac``: fraction of token occurrences that are repeats
      (1 - distinct/total);
    - ``top_token_frac``: share of the single most frequent token — the
      longest run in the SORTED token array, computed by one row-local
      fold (no explode, no per-token shuffle);
    - ``dup_2gram_frac``: fraction of duplicated 2-gram occurrences.

    Everything is a row-local projection over one tokenize — the filter a
    100 TB curation pass applies per document with zero shuffle.  Ratios
    are single IEEE divisions of exact integers (cross-engine
    bit-identical, same rule as :func:`quality_score`).

    The token array is BOUND ONCE behind a ``Generate`` barrier
    (``explode(array(tokens(...)))`` — exactly one output row per input
    row): higher-order-function lambdas are interpreted with no
    common-subexpression elimination and ``CollapseProject`` inlines
    plain aliases, so referencing ``tokens(text)`` from the ~8 downstream
    expressions would re-run the per-row tokenize for each reference
    (VERDICT r3).  A generator output is a real attribute, not an alias —
    downstream references are column reads.
    """
    from spark_sql_hbase_spark.functions.texthash import tokens

    bound = df.select(
        F.col(id_col), F.explode(F.array(tokens(F.col(text_col)))).alias("__tok")
    )
    tok = F.col("__tok")
    n = F.size(tok).cast("long")
    d = F.greatest(n, F.lit(1).cast("long"))
    # longest equal-run in the sorted array == max token multiplicity;
    # the fold state is (prev token, current run, best run) — state-field
    # references are row-value reads, not upstream recomputation
    def _step(acc, x):
        nxt = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            nxt.alias("run"),
            F.greatest(acc["best"], nxt).alias("best"),
        )

    top_cnt = F.aggregate(
        F.array_sort(tok),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        _step,
        lambda acc: acc["best"],
    )
    # RAW (non-distinct) 2-gram list — texthash.shingles dedupes, which
    # would make the duplicate fraction identically zero
    m2 = F.size(tok) - 1
    g2 = F.when(
        F.size(tok) >= 2,
        F.zip_with(
            F.slice(tok, 1, m2),
            F.slice(tok, 2, m2),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n2 = F.size(g2).cast("long")
    d2 = F.greatest(n2, F.lit(1).cast("long"))
    return bound.select(
        F.col(id_col),
        n.alias("n_tokens"),
        ((n - F.size(F.array_distinct(tok)).cast("long")).cast("double") / d).alias(
            "dup_token_frac"
        ),
        (top_cnt.cast("double") / d).alias("top_token_frac"),
        ((n2 - F.size(F.array_distinct(g2)).cast("long")).cast("double") / d2).alias(
            "dup_2gram_frac"
        ),
    )


def quality_mix_plan(
    df: DataFrame,
    stream_col: str,
    id_col: str,
    text_col: str,
    n_buckets: int = 10,
    boundaries: str = "approx",
    accuracy: int = 10000,
) -> DataFrame:
    """Data-mix planning: bucket documents into per-stream quality
    deciles and emit the (stream, decile) manifest a mixture sampler
    draws from — counts and whitespace-token budgets per bucket.

    Scale-safe plan (NO window): per-stream decile *boundaries* via one
    map-side-combined percentile aggregate, broadcast back (streams x
    (n_buckets-1) doubles), bucket by range comparison — one aggregate +
    one projection + one final rollup.  The round-2 ntile version sorted
    every document of a stream through ONE task (per-stream global sort);
    at 100 TB a single web-crawl stream is most of the corpus, so that
    shape is a scale-killer.  This one never sorts: the boundary pass is
    a sketch aggregate and the bucket pass is a row-local projection.

    Bucket rule (deterministic, right-closed): bucket = 1 + #{i :
    quality > b_i} over boundaries b_1..b_{n_buckets-1}, i.e. bucket i
    covers (b_{i-1}, b_i] — a doc exactly AT a boundary falls in the
    LOWER bucket.  Ties share a bucket (value-based, no id tiebreak), so
    bucket sizes are approximately n/n_buckets rather than ntile-exact;
    empty buckets are simply absent from the manifest.

    boundaries="approx" (default, the 100 TB path): boundaries from
    percentile_approx (Greenwald-Khanna sketch, map-side combined,
    bounded memory).  boundaries="exact": ANSI percentile_disc ==
    DuckDB quantile_disc, bit-reproducible by an external oracle, but
    memory-bound by distinct quality values per stream; used by the z27
    gate so DuckDB can compute the twin.  Both modes pick boundaries
    that are actual DATA VALUES (disc / sketch), never interpolated:
    percentile_cont-style interpolation differs by 1 ulp between
    engines, and a doc whose quality sits exactly at a boundary then
    flips buckets (observed at sf0.1).  Both modes share the exact same
    plan shape (aggregate -> broadcast join -> projection -> rollup);
    only the boundary aggregate differs.

    The source is scanned twice (boundary pass + bucket pass) — cache
    the scored frame upstream if the quality expression is hot.
    """
    # round 14: quality_expr is all regexp_count now — the Generate
    # barrier that guarded the token array's multiple references is gone
    scored = df.select(
        F.col(stream_col),
        F.col(id_col),
        quality_expr(text_col).alias("quality"),
        ws_token_count(text_col).alias("n_tokens"),
    )
    if boundaries == "approx":
        ps = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
        bounds = scored.groupBy(stream_col).agg(
            F.percentile_approx("quality", ps, F.lit(accuracy)).alias("_bs")
        )
    elif boundaries == "exact":
        aggs = [
            F.expr(
                f"percentile_disc({i / n_buckets}) WITHIN GROUP (ORDER BY quality)"
            ).alias(f"_b{i}")
            for i in range(1, n_buckets)
        ]
        bounds = scored.groupBy(stream_col).agg(*aggs).select(
            stream_col,
            F.array(*[F.col(f"_b{i}") for i in range(1, n_buckets)]).alias("_bs"),
        )
    else:
        raise ValueError(f"boundaries must be 'approx' or 'exact', got {boundaries!r}")
    # _bs is an aggregate output (a materialized row value, not an
    # inlinable derived-array expression), so per-item references below
    # are plain GetArrayItem reads — the single-reference HOF discipline
    # does not apply across the aggregation barrier.
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + (F.col("quality") > F.col("_bs")[i]).cast("int")
    return (
        scored.join(F.broadcast(bounds), stream_col)
        .select(
            F.col(stream_col),
            F.col("quality"),
            F.col("n_tokens"),
            bucket.cast("int").alias("bucket"),
        )
        .groupBy(stream_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("quality"), 6).alias("min_quality"),
            F.round(F.max("quality"), 6).alias("max_quality"),
            F.sum("n_tokens").cast("long").alias("bucket_tokens"),
        )
    )


def budget_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    text_col: str,
    budget_tokens: int,
    gate_mod: int = 1_000_000,
) -> DataFrame:
    """Token-budget subsampling per stratum — the step that CONSUMES a
    mix manifest (:func:`quality_mix_plan`): downsample each stratum to
    ≈ ``budget_tokens`` whitespace tokens by keeping documents whose
    deterministic id-hash gate falls below ``frac · gate_mod``, where
    ``frac = min(1, budget / stratum_total)``.

    Kept token mass equals the budget in EXPECTATION (the md5 gate is
    uniform and independent of document length; relative deviation
    ~ 1/√n_kept) and equals the stratum exactly when the budget covers
    it.  Same hash-gate contract as the ``t05`` stratified sample: the
    keep decision is a pure row function of (id, stratum) — reproducible
    across engines, runs, and cluster sizes, no RNG state.

    Scale shape: one map-side-combined per-stratum token total
    (broadcast back — strata are bounded), one row-local gate
    comparison, one final per-stratum rollup.  NO sort, NO window, no
    per-stratum single-task funnel anywhere — the alternative
    "cumulative-sum until budget" formulation puts every document of a
    stratum through one ordered task, the exact shape the round-2 mix
    plan was rejected for.

    Returns the audit report (stratum, total_tokens, cut, kept_docs,
    kept_tokens) — one row per stratum INCLUDING strata where nothing
    clears the gate (kept_docs = kept_tokens = 0; ADVICE r4: the
    filter-then-aggregate form silently dropped exactly the strata most
    worth auditing, e.g. budget_tokens = 0).  Use
    :func:`budget_sample_rows` to materialize the sample itself.
    """
    m = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("id"),
        ws_token_count(text_col).alias("n_tokens"),
        _sample_gate(id_col, gate_mod).alias("gate"),
    )
    totals = m.groupBy("stratum").agg(
        F.sum("n_tokens").cast("long").alias("total_tokens")
    )
    cuts = totals.select(
        "stratum", "total_tokens", _budget_cut(budget_tokens, gate_mod).alias("cut")
    )
    # conditional aggregate over ALL rows (not filter-then-agg): every
    # stratum emits a report row even when zero documents clear the gate,
    # at the same two corpus scans (totals + this rollup)
    kept_flag = F.col("gate") < F.col("cut")
    return (
        m.join(F.broadcast(cuts), "stratum")
        .groupBy("stratum", "total_tokens", "cut")
        .agg(
            F.count(F.when(kept_flag, F.lit(1))).alias("kept_docs"),
            F.coalesce(F.sum(F.when(kept_flag, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


def _sample_gate(id_col: str, gate_mod: int):
    """The deterministic id-hash sampling gate shared by
    :func:`budget_sample` / :func:`quota_sample` and their ``*_rows``
    materializers — a pure row function of the id, so the report and the
    materialized sample can never disagree."""
    from spark_sql_hbase_spark.functions.texthash import word_hash

    return word_hash(F.col(id_col).cast("string")) % gate_mod


def _budget_cut(budget_tokens: int, gate_mod: int):
    """Per-stratum gate cutoff at ``frac = min(1, budget/total)``.
    greatest(total, 1): a zero-token stratum takes frac = 1 (keep all)
    instead of an ANSI divide-by-zero.  Expects ``total_tokens``."""
    return (
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(float(budget_tokens))
                / F.greatest(F.col("total_tokens"), F.lit(1)),
            )
            * gate_mod
        ).cast("long")
    )


def budget_sample_rows(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    text_col: str,
    budget_tokens: int,
    gate_mod: int = 1_000_000,
) -> DataFrame:
    """Materialize the :func:`budget_sample` sample itself: the input
    rows (all original columns) whose gate clears the per-stratum cut —
    the same gate expression and cut the report audits, exposed as a
    function so callers never re-derive it by hand (VERDICT r4 "What's
    missing" #2).  Same plan shape: per-stratum totals broadcast back,
    one row-local gate comparison — no sort, no window."""
    m = df.withColumn("__n_tokens", ws_token_count(text_col)).withColumn(
        "__gate", _sample_gate(id_col, gate_mod)
    )
    cuts = (
        m.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(F.sum("__n_tokens").cast("long").alias("total_tokens"))
        .select("stratum", _budget_cut(budget_tokens, gate_mod).alias("__cut"))
    )
    return (
        m.join(F.broadcast(cuts), m[stratum_col] == cuts["stratum"])
        .filter(F.col("__gate") < F.col("__cut"))
        .drop("stratum", "__n_tokens", "__gate", "__cut")
    )


def quota_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    k: int,
    oversample: float = 3.0,
    gate_mod: int = 1_000_000,
) -> DataFrame:
    """Deterministic exact-quota sampling: (up to) ``k`` documents per
    stratum, chosen as the k SMALLEST id-hash gates — reproducible
    across engines, runs, and cluster sizes, and stable under corpus
    growth (a doc stays selected until k smaller hashes exist).
    Completes the sampling triad: rate-based (t05), token-budget
    (:func:`budget_sample`), exact-quota (this).

    Scale shape (NO per-stratum full sort): phase 1 keeps candidates
    whose gate clears a broadcast per-stratum threshold at
    ``min(1, oversample·k/n)`` — a row-local comparison, identical to
    :func:`budget_sample`'s gate; phase 2 ranks ONLY the ~oversample·k
    survivors per stratum (a window over a k-sized fraction, not the
    corpus).  The quota is met unless the binomial tail under-fills the
    candidate set (P < 1e-6 at oversample=3 for k ≥ 5); the output is a
    pure function of the data either way (the oracle runs the same two
    phases).  Emits (stratum, id, gate, rn).
    """
    from pyspark.sql import Window as W

    m = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("id"),
        _sample_gate(id_col, gate_mod).alias("gate"),
    )
    cuts = m.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).select(
        "stratum",
        F.floor(
            F.least(F.lit(1.0), F.lit(float(oversample * k)) / F.col("n")) * gate_mod
        )
        .cast("long")
        .alias("cut"),
    )
    cand = m.join(F.broadcast(cuts), "stratum").filter(F.col("gate") < F.col("cut"))
    w = W.partitionBy("stratum").orderBy("gate", "id")
    return (
        cand.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("stratum", "id", "gate", "rn")
    )


def quota_sample_rows(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    k: int,
    oversample: float = 3.0,
    gate_mod: int = 1_000_000,
) -> DataFrame:
    """Materialize the :func:`quota_sample` sample itself: the input
    rows (all original columns) whose id is selected — a broadcast
    left-semi join against the (tiny, ≤ k·|strata|-row) selection, so
    the corpus side never shuffles (VERDICT r4 "What's missing" #2)."""
    sel = quota_sample(df, stratum_col, id_col, k, oversample, gate_mod).select(
        F.col("id").alias("__sel_id")
    )
    return df.join(
        F.broadcast(sel), df[id_col] == sel["__sel_id"], "left_semi"
    )


def temperature_mix(
    df: DataFrame,
    stream_col: str,
    text_col: str,
    budget_tokens: int,
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-scaled source mixture planning (the multilingual /
    multi-source sampling rule of Raffel et al. 2020 §3.4.3 and Conneau
    et al. 2020 §3): each stream's natural token share ``p = tokens /
    total`` is flattened to sampling weight ``q ∝ p^alpha`` (alpha < 1
    up-samples small sources, alpha = 1 is natural, alpha = 0 uniform),
    and a global token budget is split as ``target = floor(q · budget)``.

    Returns one row per stream: (stream, n_docs, stream_tokens, p, q,
    target_tokens, sample_rate) — ``sample_rate = min(1, target /
    stream_tokens)`` plugs straight into the :func:`budget_sample` /
    :func:`_sample_gate` hash-gate machinery (pass ``target_tokens`` as
    that stream's budget) to materialize the mixture.

    Scale shape: ONE corpus scan (map-side-combined per-stream doc/token
    totals); everything after operates on the stream-cardinality
    aggregate — the two unpartitioned windows (grand total, weight
    normalizer) exchange a handful of rows, never documents.  ``p`` and
    ``q`` are rounded before deriving targets so the plan is
    reproducible cross-engine; ``alpha = 0.5`` (the common default)
    rides ``sqrt``, which IEEE-754 requires to be correctly rounded —
    bit-identical across engines — while other alphas use ``pow`` (1-ulp
    envelope, absorbed by the rounding).
    """
    from pyspark.sql import Window

    per = (
        df.select(
            F.col(stream_col).alias("stream"),
            ws_token_count(text_col).alias("n_tokens"),
        )
        .groupBy("stream")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("stream_tokens"),
        )
    )
    w_all = Window.partitionBy()
    scored = per.withColumn(
        "p",
        F.round(
            F.col("stream_tokens")
            / F.greatest(F.sum("stream_tokens").over(w_all), F.lit(1)),
            round_to,
        ),
    )
    weight = (
        F.sqrt(F.col("p"))
        if float(alpha) == 0.5
        else F.pow(F.col("p"), F.lit(float(alpha)))
    )
    # greatest(·, 1e-12): an all-empty-text corpus makes every weight 0
    # and the normalizer 0/0 — emit q = 0 rows instead of NULLs (a no-op
    # for any real corpus; the oracle twin applies the same guard)
    scored = scored.withColumn("__w", weight).withColumn(
        "q",
        F.round(
            F.col("__w") / F.greatest(F.sum("__w").over(w_all), F.lit(1e-12)),
            round_to,
        ),
    )
    return (
        scored.select(
            "stream",
            "n_docs",
            "stream_tokens",
            "p",
            "q",
            F.floor(F.col("q") * F.lit(int(budget_tokens)))
            .cast("long")
            .alias("target_tokens"),
        ).withColumn(
            "sample_rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("target_tokens")
                    / F.greatest(F.col("stream_tokens"), F.lit(1)),
                ),
                round_to,
            ),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD —
    the MOSS algorithm, public): hash every k-gram of the token stream,
    slide a window of ``w`` consecutive k-gram hashes, and keep the
    minimum hash of each window.  The selected set is a position-robust
    fingerprint: any shared substring of at least ``k + w - 1`` tokens
    between two documents is GUARANTEED to contribute at least one
    common fingerprint, while the expected density is only ``2/(w+1)``
    of all k-grams — the overlap-detection primitive behind plagiarism /
    near-dup span detection at a fraction of full shingle cost.

    Emits one row per distinct selected hash: ``(id, fp)``.  Documents
    with at least one k-gram but fewer than ``w`` of them emit the single
    global minimum (the "at least one fingerprint per document" floor).

    Plan shape (scales to 100 TB): the entire operator is row-local —
    tokenize, k-gram hash array, window minima, distinct, explode — with
    NO exchange anywhere (pinned); it parallelizes embarrassingly and
    its output shuffles only if the CALLER aggregates it (and then the
    rows are (id, 8-byte hash), never text — same contract as
    :func:`~spark_sql_hbase_spark.operators.dedup.duplicate_spans`).
    Both the token array and the hash array are bound behind Generate
    barriers: the per-element lambdas reference concrete columns, so the
    document is tokenized exactly once and each k-gram hashed exactly
    once (CollapseProject would otherwise inline the alias and re-run
    the full chain per element).
    """
    from spark_sql_hbase_spark.operators.dedup import _parallelized

    # k-gram rolling-window hashes: same md5-56 windows as duplicate_spans
    wh = (
        f"CASE WHEN size(__tok) >= {k} THEN "
        f"transform(sequence(0, size(__tok) - {k}), "
        f"i -> cast(conv(substring(md5(concat_ws(' ', slice(__tok, i + 1, "
        f"{k}))), 1, 14), 16, 10) AS BIGINT)) "
        f"ELSE cast(array() AS array<bigint>) END"
    )
    # window minima over the bound hash array; rightmost-tie selection is
    # irrelevant for the VALUE set (ties share the value), so the selected
    # set is pure array_min per window — deterministic in any engine
    fp = (
        f"CASE WHEN size(__whs) >= {w} THEN "
        f"array_distinct(transform(sequence(1, size(__whs) - {w} + 1), "
        f"j -> array_min(slice(__whs, j, {w})))) "
        f"WHEN size(__whs) > 0 THEN array(array_min(__whs)) "
        f"ELSE cast(array() AS array<bigint>) END"
    )
    return (
        _parallelized(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.array(tokens(F.col(text_col)))).alias("__tok"),
        )
        .select("id", F.explode(F.array(F.expr(wh))).alias("__whs"))
        .select("id", F.explode(F.expr(fp)).alias("fp"))
    )


def token_entropy(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the document's OWN token
    distribution: ``-Σ p_t ln p_t`` over within-doc term frequencies
    ``p_t = tf_t / dl``.  LOW entropy = repetitive / template text (the
    within-doc twin of the Gopher repetition heuristics), HIGH = diverse
    vocabulary; a standard row in quality-filter feature sets.  Unlike
    :func:`~spark_sql_hbase_spark.operators.ranking.unigram_surprisal`
    (which scores docs against the CORPUS distribution), entropy needs no
    corpus pass at all.

    Emits ``(id, n_tokens, entropy)`` for documents with >= 1 token.

    Plan shape (scales to 100 TB): one tokenize + explode, one map-side-
    combined (id, term) count, one per-doc combine — both shuffles are
    keyed by doc id (the second reuses nothing corpus-global: there is NO
    vocabulary-cardinality aggregate and no corpus total, so this is
    strictly cheaper than surprisal).  Determinism contract: tf/dl is an
    exact integer ratio; ln + ROUND(round_to) is the driver-green
    convention shared with bm25/surprisal.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(tokens(F.col(text_col)))).alias("__tok"),
    ).select("id", F.size("__tok").alias("dl"), F.explode("__tok").alias("term"))
    tf = toks.groupBy("id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    p = F.col("tf").cast("double") / F.col("dl")
    return (
        tf.groupBy("id", "dl")
        .agg(F.round(F.sum(-p * F.log(p)), round_to).alias("entropy"))
        .select("id", F.col("dl").cast("long").alias("n_tokens"), "entropy")
    )


def oov_rate(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str,
    text_col: str,
    term_col: str = "term",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a reference vocabulary
    (tokenizer-coverage analysis: what fraction of a corpus' token
    occurrences would an LM's top-V vocabulary miss?).  Pairs with
    :func:`vocabulary` — feed it the top-V list — or any external
    lexicon relation.

    Emits ``(id, n_tokens, n_oov, oov_rate)`` for docs with ≥ 1 token;
    the rate is ONE exact integer-ratio IEEE division (t02 convention).

    Plan shape (scales to 100 TB): tokenize + explode once; the corpus
    side LEFT-joins the (bounded, broadcast) vocabulary, so OOV marking
    is map-side; one per-doc count rollup keyed by id.  The vocabulary
    must be the bounded top-V (the point of the analysis), never the full
    corpus vocabulary.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(tokens(F.col(text_col)))).alias("__tok"),
    ).select("id", F.size("__tok").alias("dl"), F.explode("__tok").alias("term"))
    v = vocab.select(F.col(term_col).alias("term"), F.lit(1).alias("__in"))
    marked = toks.join(F.broadcast(v), "term", "left_outer")
    return (
        marked.groupBy("id", "dl")
        .agg(F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias("n_oov"))
        .select(
            "id",
            F.col("dl").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            (F.col("n_oov").cast("double") / F.col("dl")).alias("oov_rate"),
        )
    )


def source_standardized_quality(
    docs: DataFrame,
    source_col: str,
    id_col: str,
    text_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Per-source standardized quality z-scores — domain normalization
    (a raw quality cut biases against whole domains whose style scores
    systematically low; standardizing within source compares each doc to
    its OWN domain's distribution, the per-domain curation convention).

    Emits ``(id, source, quality, z)`` with
    ``z = (q − μ_src) / σ_src`` (population σ; 0.0 for degenerate
    single-value sources).

    Determinism contract: μ and σ derive from ORDER-INDEPENDENT
    decimal-exact sums (``Σ q`` at DECIMAL(38,6), ``Σ q²`` at
    DECIMAL(38,12) — the functions/det.py law), so the broadcast moments
    are bit-identical in any engine; the remaining arithmetic is one
    fixed IEEE sequence + ROUND.  Plan: one moments aggregate
    (broadcast, sources × 3 values) + one scoring projection — the
    source is scanned twice (cache the scored frame upstream if the
    quality expression is hot; t08's documented trade).
    """
    scored = docs.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        quality_expr(text_col).alias("q"),
    )
    m = scored.groupBy("source").agg(
        F.sum(F.col("q").cast("decimal(38,6)")).cast("double").alias("s1"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,12)"))
        .cast("double")
        .alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    mu = F.col("s1") / F.col("n")
    var = F.greatest(F.col("s2") / F.col("n") - mu * mu, F.lit(0.0))
    return (
        scored.join(F.broadcast(m), "source")
        .select(
            "id",
            "source",
            F.col("q").alias("quality"),
            F.when(
                var > 0, F.round((F.col("q") - mu) / F.sqrt(var), round_to)
            )
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
    )


def zipf_slope(
    df: DataFrame,
    text_col: str,
    top_k: int = 500,
    round_to: int = 4,
) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary — the standard corpus-
    health audit (natural text follows freq ∝ rank^(−s) with s ≈ 1;
    template/boilerplate-heavy or synthetic corpora deviate sharply):
    least-squares slope of ``ln(freq)`` on ``ln(rank)`` over the top-k
    terms, plus the fit's R².

    Emits ONE row: ``(n_terms, slope, r2)``.

    Plan shape (scales to 100 TB): the corpus contributes exactly the
    t09 vocabulary aggregate (map-side-combined counts + TakeOrdered
    top-k); the regression runs over the ≤ top_k surviving rows — the
    moments are single-partition sums over 500 doubles, computed in ONE
    aggregate whose input is already tiny.  Determinism: ln over exact
    integer counts and 1-based ranks (both engines bit-identical), then
    one fixed IEEE moment sequence + ROUND.
    """
    v = vocabulary(df, text_col, top_k=top_k)
    pts = v.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    k = F.col("k").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / k
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / k
    vary = F.col("syy") - F.col("sy") * F.col("sy") / k
    return m.select(
        F.col("k").cast("long").alias("n_terms"),
        F.round(cov / varx, round_to).alias("slope"),
        F.round((cov * cov) / (varx * vary), round_to).alias("r2"),
    )


def quality_threshold_sweep(
    df: DataFrame, text_col: str, n_buckets: int = 20
) -> DataFrame:
    """Keep-threshold sweep over the composite quality score: for each
    candidate threshold t_i = -0.5 + 2·i/B (the score's exact range,
    B = ``n_buckets``), how many documents survive ``quality >= t_i``,
    what corpus fraction that is, and their mean quality — the curve a
    curation run reads to CHOOSE its keep threshold (precision/volume
    trade-off), computed without ever materializing a per-threshold
    filter.

    Scale shape (100 TB): ONE corpus scan bucketizes each doc's score
    into B histogram cells (map-side combine; the shuffle is B rows),
    then suffix-cumulative window sums over the BOUNDED B-row relation
    — the unpartitioned window is benign at any corpus size because its
    input is the histogram, never the corpus.  Empty buckets are kept
    via a range join so every threshold row exists.

    Determinism: the bucket index is one add + one multiply + floor of
    the bit-identical score (same IEEE ops in the oracle); kept-quality
    sums ride the exact-decimal ``dsum`` convention.
    """
    from pyspark.sql import Window as W

    from spark_sql_hbase_spark.functions.det import DEC

    q = quality_expr(text_col)
    half_b = F.lit(float(n_buckets) / 2.0)
    bucket = F.least(
        F.greatest(F.floor((q + F.lit(0.5)) * half_b).cast("long"), F.lit(0)),
        F.lit(n_buckets - 1),
    )
    hist = (
        df.select(bucket.alias("bucket"), q.alias("q"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("q").cast(DEC)).alias("qs"),
        )
    )
    grid = df.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    full = grid.join(hist, "bucket", "left").select(
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("qs", F.lit(0).cast(DEC)).alias("qs"),
    )
    w = W.orderBy(F.desc("bucket")).rowsBetween(W.unboundedPreceding, W.currentRow)
    total = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    kept_n = F.sum("n").over(w)
    kept_q = F.round(F.sum("qs").over(w), 2).cast("double")
    return (
        full.select(
            (F.lit(-0.5) + F.col("bucket") / half_b).alias("threshold"),
            kept_n.alias("kept_docs"),
            (kept_n.cast("double") / F.sum("n").over(total)).alias("kept_frac"),
            F.when(kept_n > 0, kept_q / kept_n).alias("mean_quality"),
        )
        .orderBy("threshold")
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 2001,
    offset: int = 1000,
) -> DataFrame:
    """fastText-style hashed linear quality scorer (Joulin et al. 2016,
    'Bag of Tricks for Efficient Text Classification', public): the
    document score is the sum of per-token weights looked up by feature
    HASH — no vocabulary table, no join, one row-local fold over the
    tokenize.  This is the model-based quality filter of a curation
    stack reduced to its scale-relevant shape: with real trained
    weights the lookup is the same hash-indexed read (weights ride a
    broadcast array); here the weight function is the deterministic
    stand-in ``(word_hash(tok) % buckets) - offset`` so the gate is
    oracle-checkable.

    Determinism: weights and the score are exact INTEGERS end to end
    (the emitted ``score`` divides the integer sum by 1000 — one IEEE
    division); ``keep`` is the sign decision.  Zero shuffle: one
    projection, single-reference fold over the token array.
    """
    tok = tokens(F.col(text_col))
    w = lambda x: (word_hash(x) % F.lit(buckets)) - F.lit(offset)  # noqa: E731
    s = F.aggregate(tok, F.lit(0).cast("long"), lambda acc, x: acc + w(x))
    return df.select(
        F.col(id_col),
        s.alias("score_milli"),
        (s.cast("double") / 1000.0).alias("score"),
        (s > 0).alias("keep"),
    )


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction transform — the cleaned-corpus twin of
    :func:`pii_scan` (which audits): every email/IP/phone match is
    replaced by its ``<type>`` tag, in the fixed PII_PATTERNS order,
    and the total replacement count rides along for the audit trail.
    One row-local projection (JVM regexp_replace chain) — text never
    enters a shuffle; at 100 TB this is the zero-exchange scrub pass
    before tokenization.

    Each pattern is counted against the text AS IT STANDS before that
    pattern's replacement (not the original), so ``n_redactions``
    equals the number of substitutions actually performed — an IP
    inside an already-redacted email is not double-counted."""
    red = F.col(text_col)
    n = F.lit(0)
    for name, pat in PII_PATTERNS.items():
        n = n + F.regexp_count(red, F.lit(pat))
        red = F.regexp_replace(red, pat, f"<{name}>")
    return df.select(
        F.col(id_col),
        red.alias("text_redacted"),
        n.cast("int").alias("n_redactions"),
    )


def _quality_scored(
    df: DataFrame, id_col: str, text_col: str, *extra_cols: str
) -> DataFrame:
    """(extra_cols..., quality) per document — the shared scoring scan
    behind the drift monitors (round 14: quality is all regexp_count, no
    token array and no Generate barrier)."""
    return df.select(
        *[F.col(c) for c in extra_cols],
        quality_expr(text_col).alias("quality"),
    )


def _decile_bounds(scored: DataFrame, n_buckets: int) -> DataFrame:
    """One row ``(_bs: array<double>)`` of percentile_disc boundaries
    over ``scored.quality`` — actual data values (z27 convention)."""
    aggs = [
        F.expr(
            f"percentile_disc({i / n_buckets}) WITHIN GROUP (ORDER BY quality)"
        ).alias(f"_b{i}")
        for i in range(1, n_buckets)
    ]
    return scored.agg(*aggs).select(
        F.array(*[F.col(f"_b{i}") for i in range(1, n_buckets)]).alias("_bs")
    )


def bucket_expr(n_buckets: int) -> Column:
    """Right-closed bucket index 1..n_buckets from ``quality`` against a
    broadcast ``_bs`` boundary array — THE one bucketing rule shared by
    the batch and streaming drift monitors and the frozen reference
    model (divergence here silently desynchronizes zg42/zg45)."""
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + (F.col("quality") > F.col("_bs")[i]).cast("int")
    return bucket.cast("int")


def quality_psi(
    df: DataFrame,
    stream_col: str,
    id_col: str,
    text_col: str,
    n_buckets: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Population Stability Index of each stream's quality distribution
    against the whole corpus — the standard one-number drift monitor
    (PSI = Σ (p_i − q_i)·ln(p_i/q_i) over buckets; rule of thumb:
    < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).  Run per ingest
    round, it answers "which source changed character since the
    reference snapshot" before the change poisons a mixture plan.

    Buckets are CORPUS-decile boundaries (percentile_disc — actual data
    values, the z27 cross-engine convention; right-closed, a doc at a
    boundary falls low).  Bucket shares are add-½ smoothed over a DENSE
    stream × bucket grid (Laplace: (c + 0.5)/(n + n_buckets/2) — an
    empty bucket must contribute a finite penalty, not a log of zero).

    Emits one row per stream: ``(stream, psi)``.

    Plan shape (scales to 100 TB): one boundary aggregate (n_buckets−1
    doubles, broadcast), one row-local bucket projection, one
    (stream × bucket)-bounded count aggregate; the dense grid, corpus
    marginals and the PSI fold all operate on that bounded relation.
    No window, no sort, no UDF.  Determinism: ln + ROUND(round_to),
    the bm25 precedent.  The scored relation is a MANAGED cache (two
    consumers: boundary aggregate + bucket counts — uncached, the
    corpus tokenize+score pass would run twice); re-invocation
    unpersists the previous entry, bounding accumulation to one live
    relation (:mod:`spark_sql_hbase_spark.operators.caching`)."""
    from spark_sql_hbase_spark.operators.caching import managed_cache

    scored = managed_cache(
        _quality_scored(
            df.withColumn("stream", F.col(stream_col)), id_col, text_col, "stream"
        ),
        "quality_psi.scored",
    )
    bounds = _decile_bounds(scored, n_buckets)
    counts = (
        scored.crossJoin(F.broadcast(bounds))
        .select("stream", bucket_expr(n_buckets).alias("bucket"))
        .groupBy("stream", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    spark = df.sparkSession
    grid = counts.select("stream").distinct().crossJoin(
        spark.range(1, n_buckets + 1).select(F.col("id").cast("int").alias("bucket"))
    )
    dense = grid.join(counts, ["stream", "bucket"], "left").select(
        "stream", "bucket", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    from pyspark.sql import Window as W

    w_all = W.partitionBy()
    w_stream = W.partitionBy("stream")
    w_bucket = W.partitionBy("bucket")
    half = n_buckets / 2.0
    dense = (
        dense.withColumn("n_s", F.sum("c").over(w_stream))
        .withColumn("c_all", F.sum("c").over(w_bucket))
        .withColumn("n_all", F.sum("c").over(w_all))
    )
    p = (F.col("c") + 0.5) / (F.col("n_s") + half)
    q = (F.col("c_all") + 0.5) / (F.col("n_all") + half)
    return (
        dense.select("stream", "bucket", ((p - q) * F.log(p / q)).alias("term"))
        .groupBy("stream")
        .agg(F.round(F.sum("term"), round_to).alias("psi"))
    )


def script_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Unicode-script character profile per document: Latin / Han /
    Cyrillic / decimal-digit counts, total letters, Latin share,
    dominant script, mixed-script flag — the standard confusable/spam
    screen (mixed-script text is the classic obfuscation signal) and
    the char-level cross-check for the n-gram language IDer (zb15).

    Dominant-script tiebreak is fixed (latin ≥ han ≥ cyrillic, 'none'
    when no letters of the three).  All counts are integer regexp_count
    scans — row-local, zero shuffle at any scale; the one ratio is a
    single IEEE division (the quality_score determinism convention).

    Java regex spells scripts ``\\p{IsHan}``; RE2 (DuckDB) spells them
    ``\\p{Han}`` — :func:`script_profile_sql` mirrors with the RE2
    spelling, same character sets (both implement UTS#24)."""
    n_latin = F.regexp_count(F.col(text_col), F.lit(r"\p{IsLatin}"))
    n_han = F.regexp_count(F.col(text_col), F.lit(r"\p{IsHan}"))
    n_cyr = F.regexp_count(F.col(text_col), F.lit(r"\p{IsCyrillic}"))
    n_digit = F.regexp_count(F.col(text_col), F.lit(r"\p{Nd}"))
    n_letters = F.regexp_count(F.col(text_col), F.lit(r"\p{L}"))
    dominant = (
        F.when((n_latin == 0) & (n_han == 0) & (n_cyr == 0), F.lit("none"))
        .when((n_latin >= n_han) & (n_latin >= n_cyr), F.lit("latin"))
        .when(n_han >= n_cyr, F.lit("han"))
        .otherwise(F.lit("cyrillic"))
    )
    is_mixed = (
        (n_latin > 0).cast("int") + (n_han > 0).cast("int") + (n_cyr > 0).cast("int")
    ) >= 2
    return df.select(
        F.col(id_col),
        n_letters.cast("long").alias("n_letters"),
        n_latin.cast("long").alias("n_latin"),
        n_han.cast("long").alias("n_han"),
        n_cyr.cast("long").alias("n_cyrillic"),
        n_digit.cast("long").alias("n_digit"),
        (n_latin.cast("double") / F.greatest(n_letters, F.lit(1))).alias(
            "latin_ratio"
        ),
        dominant.alias("dominant"),
        is_mixed.alias("is_mixed"),
    )


def script_profile_sql(table: str, id_expr: str, text_expr: str) -> str:
    """DuckDB twin of :func:`script_profile` (oracle generator; RE2
    script spelling)."""
    return f"""
    WITH __c AS (
        SELECT {id_expr} AS id,
               CAST(len(regexp_extract_all(t, '\\p{{L}}')) AS BIGINT)
                   AS n_letters,
               CAST(len(regexp_extract_all(t, '\\p{{Latin}}')) AS BIGINT)
                   AS n_latin,
               CAST(len(regexp_extract_all(t, '\\p{{Han}}')) AS BIGINT)
                   AS n_han,
               CAST(len(regexp_extract_all(t, '\\p{{Cyrillic}}')) AS BIGINT)
                   AS n_cyrillic,
               CAST(len(regexp_extract_all(t, '\\p{{Nd}}')) AS BIGINT)
                   AS n_digit
        FROM (SELECT {id_expr}, {text_expr} AS t FROM {table})
    )
    SELECT id AS {id_expr}, n_letters, n_latin, n_han, n_cyrillic, n_digit,
           CAST(n_latin AS DOUBLE) / greatest(n_letters, 1) AS latin_ratio,
           CASE WHEN n_latin = 0 AND n_han = 0 AND n_cyrillic = 0 THEN 'none'
                WHEN n_latin >= n_han AND n_latin >= n_cyrillic THEN 'latin'
                WHEN n_han >= n_cyrillic THEN 'han'
                ELSE 'cyrillic' END AS dominant,
           (CAST(n_latin > 0 AS INTEGER) + CAST(n_han > 0 AS INTEGER)
            + CAST(n_cyrillic > 0 AS INTEGER)) >= 2 AS is_mixed
    FROM __c
    """


def quality_bucket_model(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Frozen reference model for the streaming PSI monitor
    (:func:`~spark_sql_hbase_spark.streaming.pipelines.
    stream_psi_monitor`): corpus decile boundaries as one row
    ``(_bs: array<double>)`` plus Laplace-smoothed per-bucket reference
    shares ``(bucket, q)`` — built from the SAME helpers
    (:func:`_quality_scored` / :func:`_decile_bounds` /
    :func:`bucket_expr`) as :func:`quality_psi`, so the batch and
    streaming drift monitors cannot diverge.  The scored relation is a
    managed cache across its two consumers (the quality_psi contract)."""
    from spark_sql_hbase_spark.operators.caching import managed_cache

    scored = managed_cache(
        _quality_scored(df, id_col, text_col), "quality_bucket_model.scored"
    )
    bounds = _decile_bounds(scored, n_buckets)
    counts = (
        scored.crossJoin(F.broadcast(bounds))
        .select(bucket_expr(n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = df.sparkSession.range(1, n_buckets + 1).select(
        F.col("id").cast("int").alias("bucket")
    )
    from pyspark.sql import Window as W

    half = n_buckets / 2.0
    dense = (
        grid.join(counts, "bucket", "left")
        .select("bucket", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        .withColumn("n", F.sum("c").over(W.partitionBy()))
    )
    shares = dense.select(
        "bucket", ((F.col("c") + 0.5) / (F.col("n") + half)).alias("q")
    )
    return bounds, shares


def vocab_bucketed(toks: DataFrame, vocab: DataFrame) -> DataFrame:
    """THE one term→bucket mapping rule shared by the batch KL operator
    and the streaming monitor (divergence here would silently
    desynchronize them — the ``bucket_expr`` precedent): every token
    maps to its vocabulary term, everything else to ``'__oov__'``, via
    a broadcast join against the bounded vocabulary."""
    vmark = F.broadcast(vocab.select(F.col("term").alias("__vterm")))
    return toks.join(
        vmark, F.col("term") == F.col("__vterm"), "left"
    ).withColumn("bucket", F.coalesce(F.col("__vterm"), F.lit("__oov__")))


def _all_buckets(spark, vocab: DataFrame) -> DataFrame:
    """The dense bucket domain: vocabulary terms plus the OOV bucket."""
    return vocab.select(F.col("term").alias("bucket")).unionByName(
        spark.range(1).select(F.lit("__oov__").alias("bucket"))
    )


def _dense_q(bucket_rows: DataFrame, buckets: DataFrame, half: float) -> DataFrame:
    """Laplace-smoothed reference shares over the DENSE bucket domain —
    a bucket with zero corpus mass still gets 0.5/(N+half)."""
    qrel = bucket_rows.groupBy("bucket").agg(F.count(F.lit(1)).alias("cq"))
    dense = buckets.join(qrel, "bucket", "left").select(
        "bucket", F.coalesce(F.col("cq"), F.lit(0)).alias("cq")
    )
    q_tot = dense.agg(F.sum("cq").alias("nq"))
    return dense.crossJoin(F.broadcast(q_tot)).select(
        "bucket", ((F.col("cq") + 0.5) / (F.col("nq") + half)).alias("q")
    )


def vocab_model(
    df: DataFrame, text_col: str, top_v: int = 100
) -> tuple[DataFrame, DataFrame]:
    """Frozen reference model for the streaming vocabulary-KL monitor
    (:func:`~spark_sql_hbase_spark.streaming.pipelines.stream_vocab_kl`):
    the corpus top-``top_v`` vocabulary ``(term)`` plus dense
    Laplace-smoothed reference shares ``(bucket, q)`` — built from the
    SAME helpers (:func:`vocab_bucketed` / :func:`_dense_q`) as
    :func:`vocab_kl`, so the batch and streaming monitors cannot
    diverge (the quality_bucket_model convention).  Both relations are
    bounded (V and V+1 rows); callers freeze them with ``cache()``."""
    from spark_sql_hbase_spark.functions.texthash import tokens
    from spark_sql_hbase_spark.operators.caching import managed_cache

    toks = managed_cache(
        df.select(F.explode(tokens(F.col(text_col))).alias("term")),
        "vocab_model.toks",
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cq"))
        .orderBy(F.col("cq").desc(), F.col("term"))
        .limit(top_v)
        .select("term")
    )
    # actual-bucket-count Laplace denominator (see vocab_kl)
    half = (vocab.count() + 1) / 2.0
    buckets = _all_buckets(df.sparkSession, vocab)
    q = _dense_q(
        vocab_bucketed(toks, vocab).select("bucket"), buckets, half
    )
    return vocab, q


def vocab_kl(
    df: DataFrame,
    stream_col: str,
    text_col: str,
    top_v: int = 100,
    round_to: int = 4,
) -> DataFrame:
    """Per-stream vocabulary KL divergence from the corpus unigram
    distribution — the CONTENT-drift twin of :func:`quality_psi` (which
    watches the quality-score distribution): a source whose wording
    shifted (new domain, template change, spam injection) moves its
    unigram distribution long before its length/punctuation profile
    does.  D_KL(P_stream ‖ Q_corpus) over the corpus TOP-``top_v``
    vocabulary plus one OOV bucket, add-½ Laplace smoothed (an unseen
    bucket must contribute a finite penalty, not log 0).

    Emits one row per stream: ``(stream, kl)``.

    Plan shape (scales to 100 TB): the corpus term count is one
    map-side-combined aggregate (the :func:`vocabulary` shape); the
    top-V cut is a TakeOrdered over (count desc, term) — V rows,
    broadcast.  Every token maps to its bucket via that broadcast
    BEFORE the stream aggregate, so the (stream × bucket) shuffle is
    bounded by S·(V+1) rows — the corpus vocabulary never rides a
    per-stream shuffle.  Determinism: integer counts, ln + final
    ROUND(``round_to``) (the bm25 precedent)."""
    from spark_sql_hbase_spark.functions.texthash import tokens
    from spark_sql_hbase_spark.operators.caching import managed_cache

    toks = managed_cache(
        df.select(
            F.col(stream_col).alias("stream"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        ),
        "vocab_kl.toks",
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cq"))
        .orderBy(F.col("cq").desc(), F.col("term"))
        .limit(top_v)
        .select("term")
    )
    # Laplace denominator over the ACTUAL bucket count |vocab|+1 — a
    # corpus with fewer than top_v distinct terms must still yield
    # proper distributions (sum(p)=sum(q)=1), or "KL" goes negative on
    # undrifted streams.  vocab.count() is a bounded (<= top_v) eager
    # model parameter, the centroid-seed discipline.
    half = (vocab.count() + 1) / 2.0
    bucketed = vocab_bucketed(toks, vocab).select("stream", "bucket")
    # corpus bucket distribution q: DENSE over vocab ∪ OOV (a bucket the
    # corpus never produced still gets its Laplace mass — the streaming
    # twin depends on this when arrivals carry out-of-corpus terms)
    buckets = _all_buckets(df.sparkSession, vocab)
    q = _dense_q(bucketed.select("bucket"), buckets, half)
    # per-stream bucket counts over the DENSE stream x bucket grid
    counts = bucketed.groupBy("stream", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    grid = counts.select("stream").distinct().crossJoin(F.broadcast(buckets))
    dense = grid.join(counts, ["stream", "bucket"], "left").select(
        "stream", "bucket", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    totals = counts.groupBy("stream").agg(F.sum("c").alias("n"))
    p = dense.join(totals, "stream").select(
        "stream",
        "bucket",
        ((F.col("c") + 0.5) / (F.col("n") + half)).alias("p"),
    )
    terms = p.join(F.broadcast(q), "bucket").select(
        "stream", (F.col("p") * F.log(F.col("p") / F.col("q"))).alias("t")
    )
    return terms.groupBy("stream").agg(
        F.round(F.sum("t"), round_to).alias("kl")
    )


def vocab_kl_sql(
    table: str,
    stream_expr: str,
    text_expr: str,
    top_v: int = 100,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`vocab_kl` (oracle generator)."""
    from spark_sql_hbase_spark.functions.texthash import tokens_sql

    # actual-bucket-count Laplace denominator, matching the Spark side
    half = "((SELECT COUNT(*) + 1 FROM __vocab) / 2.0)"
    return f"""
    WITH __toks AS (
        SELECT {stream_expr} AS stream, unnest({tokens_sql(text_expr)}) AS term
        FROM {table}
    ), __vocab AS (
        SELECT term FROM (
            SELECT term, COUNT(*) AS cq FROM __toks GROUP BY term
            ORDER BY cq DESC, term LIMIT {top_v})
    ), __bucketed AS (
        SELECT t.stream,
               CASE WHEN v.term IS NULL THEN '__oov__' ELSE t.term END AS bucket
        FROM __toks t LEFT JOIN __vocab v ON t.term = v.term
    ), __allb AS (
        SELECT term AS bucket FROM __vocab
        UNION ALL SELECT '__oov__'
    ), __qc AS (
        SELECT bucket, COUNT(*) AS cq FROM __bucketed GROUP BY bucket
    ), __q AS (
        -- DENSE over vocab ∪ OOV: a bucket the corpus never produced
        -- still gets its Laplace mass (matches the Spark _dense_q)
        SELECT b.bucket,
               (COALESCE(qc.cq, 0) + 0.5)
                   / ((SELECT COUNT(*) FROM __bucketed) + {half}) AS q
        FROM __allb b LEFT JOIN __qc qc USING (bucket)
    ), __counts AS (
        SELECT stream, bucket, COUNT(*) AS c
        FROM __bucketed GROUP BY stream, bucket
    ), __grid AS (
        SELECT s.stream, b.bucket
        FROM (SELECT DISTINCT stream FROM __bucketed) s, __allb b
    ), __tot AS (
        SELECT stream, SUM(c) AS n FROM __counts GROUP BY stream
    ), __p AS (
        SELECT g.stream, g.bucket,
               (COALESCE(c.c, 0) + 0.5) / (t.n + {half}) AS p
        FROM __grid g
        LEFT JOIN __counts c ON g.stream = c.stream AND g.bucket = c.bucket
        JOIN __tot t ON g.stream = t.stream
    )
    SELECT p.stream, ROUND(SUM(p.p * ln(p.p / q.q)), {round_to}) AS kl
    FROM __p p JOIN __q q ON p.bucket = q.bucket
    GROUP BY p.stream
    """


def vocab_kl_terms_sql(
    table: str,
    corpus_pred: str,
    arrivals_pred: str,
    text_expr: str,
    top_v: int = 100,
    round_to: int = 4,
) -> str:
    """DuckDB twin of the streaming vocabulary-KL monitor
    (:func:`~spark_sql_hbase_spark.streaming.pipelines.stream_vocab_kl`
    over ONE batch): per-bucket KL terms of the ``arrivals_pred`` rows
    against the frozen model trained on the ``corpus_pred`` rows."""
    from spark_sql_hbase_spark.functions.texthash import tokens_sql

    # actual-bucket-count Laplace denominator, matching the Spark side
    half = "((SELECT COUNT(*) + 1 FROM __vocab) / 2.0)"
    return f"""
    WITH __ct AS (
        SELECT unnest({tokens_sql(text_expr)}) AS term
        FROM {table} WHERE {corpus_pred}
    ), __vocab AS (
        SELECT term FROM (
            SELECT term, COUNT(*) AS cq FROM __ct GROUP BY term
            ORDER BY cq DESC, term LIMIT {top_v})
    ), __allb AS (
        SELECT term AS bucket FROM __vocab
        UNION ALL SELECT '__oov__'
    ), __qc AS (
        SELECT CASE WHEN v.term IS NULL THEN '__oov__' ELSE t.term END
                   AS bucket,
               COUNT(*) AS cq
        FROM __ct t LEFT JOIN __vocab v ON t.term = v.term
        GROUP BY 1
    ), __q AS (
        SELECT b.bucket,
               (COALESCE(qc.cq, 0) + 0.5)
                   / ((SELECT COUNT(*) FROM __ct) + {half}) AS q
        FROM __allb b LEFT JOIN __qc qc USING (bucket)
    ), __at AS (
        SELECT unnest({tokens_sql(text_expr)}) AS term
        FROM {table} WHERE {arrivals_pred}
    ), __ac AS (
        SELECT CASE WHEN v.term IS NULL THEN '__oov__' ELSE t.term END
                   AS bucket,
               COUNT(*) AS c
        FROM __at t LEFT JOIN __vocab v ON t.term = v.term
        GROUP BY 1
    ), __dense AS (
        SELECT b.bucket, COALESCE(a.c, 0) AS c
        FROM __allb b LEFT JOIN __ac a USING (bucket)
    )
    SELECT d.bucket, CAST(d.c AS BIGINT) AS c,
           ROUND(((d.c + 0.5) / ((SELECT SUM(c) FROM __dense) + {half}))
                 * ln(((d.c + 0.5) / ((SELECT SUM(c) FROM __dense) + {half}))
                      / q.q), {round_to}) AS kl_term
    FROM __dense d JOIN __q q USING (bucket)
    """


def doc_repetition(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_line_tokens: int = 3,
) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText
    repetition quality rules, Rae et al. 2021 appendix A — public): the
    filters a pretraining curation pass thresholds on, computed INSIDE
    each document — the complement of the cross-corpus twins
    (:func:`~spark_sql_hbase_spark.operators.dedup.line_dedup_stats`
    counts lines across documents; this counts them within one):

    - ``dup_line_frac``: beyond-first occurrences of a normalized line
      over the doc's qualifying lines (same line law as the C4-style
      corpus dedup — shared ``_norm_lines_sql``, the laws cannot
      drift);
    - ``dup_line_char_frac``: characters of those repeated instances
      over the doc's qualifying line characters;
    - ``top_bigram_char_frac``: character mass of the heaviest word
      bigram over the doc's total bigram character mass — defined as
      ``max(cnt·len)/Σ(cnt·len)`` (a pure max, so no argmax tie-break
      is ever needed).

    Emits ``(id, n_lines, dup_line_frac, dup_line_char_frac,
    top_bigram_char_frac)`` for docs with ≥ 1 qualifying line; a doc
    with < 2 tokens has no bigram and reports 0.0.  Every fraction is
    ONE IEEE division of exact integer sums — bit-identical across
    engines, no rounding anywhere.

    Plan shape (scales to 100 TB): line normalization and bigram
    construction are row-local; both branches aggregate keyed BY
    DOCUMENT — an (id, unit) partial aggregate then a per-id rollup, so
    the shuffle carries one row per distinct unit per doc and NOTHING
    corpus-global exists (no vocabulary, no df relation, no broadcast,
    no window)."""
    from spark_sql_hbase_spark.operators.dedup import _norm_lines_sql

    norm = _norm_lines_sql(text_col, min_line_tokens)
    lc = (
        docs.select(F.col(id_col).alias("id"), F.expr(norm).alias("ls"))
        .filter(F.size("ls") > 0)
        .select("id", F.explode("ls").alias("ln"))
        .groupBy("id", "ln")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    line_stats = lc.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        (
            F.sum(F.col("cnt") - 1).cast("double") / F.sum("cnt")
        ).alias("dup_line_frac"),
        (
            F.sum((F.col("cnt") - 1) * F.length("ln")).cast("double")
            / F.sum(F.col("cnt") * F.length("ln"))
        ).alias("dup_line_char_frac"),
    )
    # bigrams: THE shared construction law (ranking.doc_bigram_tf —
    # also behind bigram_surprisal, so the two cannot drift; r13 review)
    from spark_sql_hbase_spark.operators.ranking import doc_bigram_tf

    tf2 = doc_bigram_tf(docs, id_col, text_col)
    big = tf2.groupBy("id").agg(
        (
            F.max(F.col("tf") * F.length("bg")).cast("double")
            / F.sum(F.col("tf") * F.length("bg"))
        ).alias("top_bigram_char_frac")
    )
    return line_stats.join(big, "id", "left_outer").select(
        "id",
        "n_lines",
        "dup_line_frac",
        "dup_line_char_frac",
        F.coalesce("top_bigram_char_frac", F.lit(0.0)).alias(
            "top_bigram_char_frac"
        ),
    )


def doc_repetition_gopher(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_para_tokens: int = 1,
    ns: tuple = (3, 4),
) -> DataFrame:
    """The REST of the Gopher/MassiveText within-document repetition
    rule set (Rae et al. 2021 appendix A; r13 VERDICT item 6) —
    :func:`doc_repetition` covers the line rules and the top bigram,
    this covers the paragraph rules and the higher gram orders:

    - ``dup_para_frac`` / ``dup_para_char_frac``: beyond-first
      occurrences of a normalized PARAGRAPH (newline-run unit law,
      ``dedup._norm_paras_sql`` — the same normalization as the line
      law, only the boundary differs) over the doc's qualifying
      paragraphs / their characters;
    - ``top_{n}gram_char_frac`` for each ``n`` in ``ns``: character
      mass of the heaviest word n-gram over the doc's total n-gram
      character mass — ``max(tf·len)/Σ(tf·len)``, the pure-max rule
      shared with the bigram column, built on the ONE generalized
      n-gram law (``ranking.doc_ngram_tf``).

    Emits ``(id, n_paras, dup_para_frac, dup_para_char_frac,
    top_{n}gram_char_frac...)`` for docs with ≥ 1 qualifying
    paragraph; a doc with < n tokens has no n-gram and reports 0.0.
    Every fraction is ONE IEEE division of exact integer sums.

    Plan shape (scales to 100 TB): same as :func:`doc_repetition` —
    row-local unit construction, per-document keyed aggregates only
    (one (id, unit) partial aggregate + per-id rollup per branch),
    NOTHING corpus-global."""
    from spark_sql_hbase_spark.operators.dedup import _norm_paras_sql
    from spark_sql_hbase_spark.operators.ranking import doc_ngram_tf

    norm = _norm_paras_sql(text_col, min_para_tokens)
    pc = (
        docs.select(F.col(id_col).alias("id"), F.expr(norm).alias("ps"))
        .filter(F.size("ps") > 0)
        .select("id", F.explode("ps").alias("pa"))
        .groupBy("id", "pa")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = pc.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_paras"),
        (
            F.sum(F.col("cnt") - 1).cast("double") / F.sum("cnt")
        ).alias("dup_para_frac"),
        (
            F.sum((F.col("cnt") - 1) * F.length("pa")).cast("double")
            / F.sum(F.col("cnt") * F.length("pa"))
        ).alias("dup_para_char_frac"),
    )
    for n in ns:
        col = f"top_{n}gram_char_frac"
        tfn = doc_ngram_tf(docs, id_col, text_col, int(n))
        top = tfn.groupBy("id").agg(
            (
                F.max(F.col("tf") * F.length("ng")).cast("double")
                / F.sum(F.col("tf") * F.length("ng"))
            ).alias(col)
        )
        out = out.join(top, "id", "left_outer").withColumn(
            col, F.coalesce(col, F.lit(0.0))
        )
    return out


def doc_repetition_gopher_sql(
    table: str,
    id_expr: str,
    text_col: str,
    tokens_expr: str,
    min_para_tokens: int = 1,
    ns: tuple = (3, 4),
) -> str:
    """DuckDB twin of :func:`doc_repetition_gopher` (oracle generator)
    — the paragraph law mirrors ``dedup._norm_paras_sql`` exactly and
    every gram order is the shared ``ranking.doc_ngram_tf_sql``
    fragment."""
    from spark_sql_hbase_spark.operators.ranking import doc_ngram_tf_sql

    mt = int(min_para_tokens)
    gram_ctes = []
    gram_cols = []
    gram_joins = []
    for n in ns:
        n = int(n)
        col = f"top_{n}gram_char_frac"
        gram_ctes.append(
            f"""__tf{n} AS (
        {doc_ngram_tf_sql(table, id_expr, tokens_expr, n)}
    ), __top{n} AS (
        SELECT id,
               CAST(MAX(tf * len(ng)) AS DOUBLE)
                   / SUM(tf * len(ng)) AS {col}
        FROM __tf{n} GROUP BY 1
    )"""
        )
        gram_cols.append(f"COALESCE(g{n}.{col}, 0.0) AS {col}")
        gram_joins.append(f"LEFT JOIN __top{n} g{n} USING (id)")
    return f"""
    WITH __pn AS (
        SELECT {id_expr} AS id,
               list_filter(
                   list_transform(
                       string_split_regex(lower({text_col}), '[\\r\\n]+'),
                       x -> trim(x)),
                   x -> x <> '' AND
                        len(list_filter(
                            string_split_regex(x, '[^a-z0-9]+'),
                            y -> y <> '')) >= {mt}) AS ps
        FROM {table}
    ), __pe AS (
        SELECT id, unnest(ps) AS pa FROM __pn WHERE len(ps) > 0
    ), __pc AS (
        SELECT id, pa, COUNT(*) AS cnt FROM __pe GROUP BY 1, 2
    ), __pstats AS (
        SELECT id,
               CAST(SUM(cnt) AS BIGINT) AS n_paras,
               CAST(SUM(cnt - 1) AS DOUBLE) / SUM(cnt) AS dup_para_frac,
               CAST(SUM((cnt - 1) * len(pa)) AS DOUBLE)
                   / SUM(cnt * len(pa)) AS dup_para_char_frac
        FROM __pc GROUP BY 1
    ), {", ".join(gram_ctes)}
    SELECT p.id, p.n_paras, p.dup_para_frac, p.dup_para_char_frac,
           {", ".join(gram_cols)}
    FROM __pstats p {" ".join(gram_joins)}
    """


def doc_repetition_sql(
    table: str,
    id_expr: str,
    text_col: str,
    tokens_expr: str,
    min_line_tokens: int = 3,
) -> str:
    """DuckDB twin of :func:`doc_repetition` (oracle generator) — the
    line law mirrors ``dedup._norm_lines_sql`` exactly (the zg27
    precedent), the bigram law IS the shared fragment
    ``ranking.doc_bigram_tf_sql`` (also behind ``bigram_surprisal_sql``;
    r13 review — one law, two consumers)."""
    from spark_sql_hbase_spark.operators.ranking import doc_bigram_tf_sql

    mt = int(min_line_tokens)
    return f"""
    WITH __ln AS (
        SELECT {id_expr} AS id,
               list_filter(
                   list_transform(string_split_regex(lower({text_col}), '[.!?]+'),
                                  x -> trim(x)),
                   x -> x <> '' AND
                        len(list_filter(
                            string_split_regex(x, '[^a-z0-9]+'),
                            y -> y <> '')) >= {mt}) AS ls
        FROM {table}
    ), __le AS (
        SELECT id, unnest(ls) AS ln FROM __ln WHERE len(ls) > 0
    ), __lc AS (
        SELECT id, ln, COUNT(*) AS cnt FROM __le GROUP BY 1, 2
    ), __lstats AS (
        SELECT id,
               CAST(SUM(cnt) AS BIGINT) AS n_lines,
               CAST(SUM(cnt - 1) AS DOUBLE) / SUM(cnt) AS dup_line_frac,
               CAST(SUM((cnt - 1) * len(ln)) AS DOUBLE)
                   / SUM(cnt * len(ln)) AS dup_line_char_frac
        FROM __lc GROUP BY 1
    ), __tf2 AS (
        {doc_bigram_tf_sql(table, id_expr, tokens_expr)}
    ), __big AS (
        SELECT id,
               CAST(MAX(tf * len(bg)) AS DOUBLE)
                   / SUM(tf * len(bg)) AS top_bigram_char_frac
        FROM __tf2 GROUP BY 1
    )
    SELECT l.id, l.n_lines, l.dup_line_frac, l.dup_line_char_frac,
           COALESCE(b.top_bigram_char_frac, 0.0) AS top_bigram_char_frac
    FROM __lstats l LEFT JOIN __big b USING (id)
    """


# C4 line-rule cleaning (Raffel et al. 2020 §2.2, "Colossal Clean
# Crawled Corpus"): keep only lines that end in a terminal punctuation
# mark, have at least `min_words` words, and contain neither
# "javascript" nor "lorem ipsum" nor a curly brace; keep only
# documents retaining at least `min_kept_lines` lines.  The
# per-document twin of the CORPUS-level `boilerplate_ngrams` heuristic.
# \z (end of INPUT), not $: Java's default $ also matches before a
# final \r, RE2's does not — $ would silently diverge the twin on any
# CRLF corpus (review fix).  Both engines support \z identically.
_C4_TERM_RE = '[.!?"]\\z'
_C4_WS_RE = "[ \t]+"


def c4_line_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 3,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 heuristic line cleaning — entirely row-local JVM expressions
    (split / transform / filter / array_join): no shuffle, no UDF, no
    corpus-global state, so the operator scales as a pure projection
    over the corpus scan at any size (plan-pinned exchange-free).

    The kept-lines array is referenced three times at TOP level (count,
    join, keep flag) — a linear per-row cost, unlike the per-ELEMENT
    re-reference blowups the single-reference discipline guards
    against (`functions/texthash.py`).

    Returns ``id, n_lines, n_kept, kept, text_clean`` (counts BIGINT to
    match the DuckDB twin's ``len()``)."""
    # \r?\n: CRLF corpora must not leave a trailing \r on every line
    # (trim strips spaces only) — same regex split in the DuckDB twin
    lines = F.split(F.col(text_col), "\\r?\\n")

    def _keep(x: Column) -> Column:
        words = F.filter(
            F.split(x, _C4_WS_RE), lambda y: y != F.lit("")
        )
        return (
            (x != F.lit(""))
            & x.rlike(_C4_TERM_RE)
            & (F.size(words) >= F.lit(int(min_words)))
            & ~F.lower(x).contains("javascript")
            & ~F.lower(x).contains("lorem ipsum")
            & ~x.contains("{")
        )

    # explicit lambda: F.trim itself has an optional second parameter,
    # which transform() would fill with the element INDEX (as trim chars)
    kept_arr = F.filter(F.transform(lines, lambda x: F.trim(x)), _keep)
    n_kept = F.size(kept_arr).cast("long")
    return df.select(
        F.col(id_col).alias("id"),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.alias("n_kept"),
        (n_kept >= F.lit(int(min_kept_lines))).alias("kept"),
        F.array_join(kept_arr, "\n").alias("text_clean"),
    )


def c4_line_clean_sql(
    table: str,
    id_expr: str,
    text_col: str,
    min_words: int = 3,
    min_kept_lines: int = 3,
) -> str:
    """DuckDB twin of :func:`c4_line_clean` (oracle generator).  The
    word split deliberately uses the explicit class ``[ \\t]+`` in BOTH
    engines (Java regex ``\\s`` includes U+000B, RE2's does not — the
    cross-engine determinism convention), and both sides drop empty
    split tokens (a tab-leading line survives ``trim``, which strips
    spaces only, and would otherwise split to a leading empty)."""
    mw, mk = int(min_words), int(min_kept_lines)
    return f"""
    WITH __l AS (
        SELECT {id_expr} AS id,
               string_split_regex({text_col}, '\\r?\\n') AS ls
        FROM {table}
    ), __k AS (
        SELECT id, ls,
               list_filter(
                   list_transform(ls, x -> trim(x)),
                   x -> x <> ''
                        AND regexp_matches(x, '{_C4_TERM_RE}')
                        AND len(list_filter(
                                regexp_split_to_array(x, '[ \t]+'),
                                y -> y <> '')) >= {mw}
                        AND NOT contains(lower(x), 'javascript')
                        AND NOT contains(lower(x), 'lorem ipsum')
                        AND NOT contains(x, '{{')) AS ks
        FROM __l
    )
    SELECT id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(ks) AS BIGINT) AS n_kept,
           len(ks) >= {mk} AS kept,
           CASE WHEN ls IS NULL THEN NULL
                ELSE COALESCE(array_to_string(ks, chr(10)), '')
           END AS text_clean
    FROM __k
    """

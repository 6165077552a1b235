"""Every registered query with an oracle must hash-match DuckDB locally
(the driver repeats this at sf0.01; here we run the smoke SF for speed)."""

import os

import pytest

from spark_sql_hbase_spark.queries import load_all
from tests.oracle import compare

QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    qd = QUERIES[name]
    df = qd.fn(spark, sf_dir)
    assert df is not None
    # Scalar-schema law (was its own parametrized test): the driver's row
    # digest dies on non-scalar cells (pandas unique on a list) — q16's
    # round-1 ERR.  Asserted here on the SAME execution because building
    # the DataFrame is the expensive part for the procedural keyed /
    # streaming gates (fn() runs the whole store/stream pipeline), and a
    # separate parametrized test re-ran every gate just to read
    # df.schema — ~400 s of pure duplication across the battery (r15).
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"{name}: non-scalar result columns {bad}"
    if qd.oracle is None:
        assert df.count() >= 0  # rows-only smoke
        return
    ok, msg = compare(df, qd.oracle, sf_dir)
    assert ok, f"{name}: {msg}"


def test_oracle_harness_is_type_sensitive(spark, sf_dir):
    """Round-1 failure class: DuckDB returns bare integer SUM as HUGEINT,
    which the driver hashes differently from Spark's bigint even when the
    values match.  A deliberately-HUGEINT oracle must FAIL locally."""
    from pyspark.sql import functions as F

    from spark_sql_hbase_spark.queries import table

    df = table(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(
        F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)).alias("n_big")
    )
    bare = (
        "SELECT o_orderstatus, SUM(CASE WHEN o_totalprice>100000 THEN 1 ELSE 0 END)"
        " AS n_big FROM orders GROUP BY o_orderstatus"
    )
    ok, msg = compare(df, bare, sf_dir)
    assert not ok and "values differ" in msg
    cast = bare.replace(
        "SUM(CASE WHEN o_totalprice>100000 THEN 1 ELSE 0 END)",
        "CAST(SUM(CASE WHEN o_totalprice>100000 THEN 1 ELSE 0 END) AS BIGINT)",
    )
    ok, msg = compare(df, cast, sf_dir)
    assert ok, msg


SF_DRIVER = os.environ.get("SPARK_GRAFT_DRIVER_SF", "/root/testdata/sf0.01")


@pytest.mark.sf001
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_at_driver_scale(spark, name):
    """Driver-parity slow lane (VERDICT r5 item 2): the same oracle
    comparison the driver runs, at the driver's sf0.01 — so every query
    outside the 50-entry CORRECTNESS window still has local evidence at
    the scale the driver would use."""
    qd = QUERIES[name]
    df = qd.fn(spark, SF_DRIVER)
    if qd.oracle is None:
        assert df.count() >= 0
        return
    ok, msg = compare(df, qd.oracle, SF_DRIVER)
    assert ok, f"{name}: {msg}"


def test_pii_redact_overlap_counts_match_replacements(spark):
    """Review fix: an IP embedded in an email must not double-count —
    n_redactions equals the substitutions actually performed."""
    from spark_sql_hbase_spark.operators.text import pii_redact

    df = spark.createDataFrame(
        [(1, "mail bob@10.1.2.3.example.com end")], "id long, t string"
    )
    row = pii_redact(df, "id", "t").collect()[0]
    assert row["text_redacted"] == "mail <email> end"
    assert row["n_redactions"] == 1


def test_c4_line_clean_rules(spark):
    """Every C4 line rule fires: terminal punctuation, min words,
    javascript / lorem ipsum / curly-brace blocklists, and the
    min-kept-lines document filter — on a crafted document where each
    rule is the only reason its line drops."""
    from spark_sql_hbase_spark.operators.text import c4_line_clean

    text = "\n".join(
        [
            "this line is kept because it ends well.",
            "no terminal punctuation here",
            "Too short.",
            "this one mentions JavaScript so it drops.",
            "sadly lorem ipsum filler text drops too.",
            "a brace { disqualifies this line.",
            "  whitespace is trimmed and this stays!  ",
            'quoted endings count as terminal."',
        ]
    )
    df = spark.createDataFrame([(1, text), (2, "word soup only")], "id long, t string")
    rows = {r["id"]: r for r in c4_line_clean(df, "id", "t").collect()}
    assert rows[1]["n_lines"] == 8
    assert rows[1]["n_kept"] == 3
    assert rows[1]["kept"] is True
    assert rows[1]["text_clean"] == "\n".join(
        [
            "this line is kept because it ends well.",
            "whitespace is trimmed and this stays!",
            'quoted endings count as terminal."',
        ]
    )
    assert rows[2]["n_lines"] == 1 and rows[2]["n_kept"] == 0
    assert rows[2]["kept"] is False and rows[2]["text_clean"] == ""


def test_c4_line_clean_crlf_and_null_match_duckdb(spark):
    """Review fix (cross-engine determinism): CRLF corpora split clean
    in BOTH engines (\\r?\\n split; Java's $ would have matched before a
    final \\r where RE2's does not — the anchor is \\z), and NULL text
    stays NULL everywhere (the empty-list COALESCE must not fire on the
    NULL-input path).  Asserted against DuckDB directly."""
    import duckdb

    from spark_sql_hbase_spark.operators.text import (
        c4_line_clean,
        c4_line_clean_sql,
    )

    rows = [
        (1, "crlf lines end well here.\r\nand this one also does.\r\nno punct"),
        (2, None),
        (3, "unix line that ends well stays.\nshort.\n"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r["id"]: (r["n_lines"], r["n_kept"], r["kept"], r["text_clean"])
        for r in c4_line_clean(df, "id", "t").collect()
    }
    assert got[1] == (3, 2, False,
                      "crlf lines end well here.\nand this one also does.")
    assert got[2] == (None, None, None, None)
    assert got[3] == (3, 1, False, "unix line that ends well stays.")

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "(1, 'crlf lines end well here.' || chr(13) || chr(10) || "
        "'and this one also does.' || chr(13) || chr(10) || 'no punct'), "
        "(2, NULL), "
        "(3, 'unix line that ends well stays.' || chr(10) || 'short.' "
        "|| chr(10))) v(id, t)"
    )
    oracle = {
        r[0]: tuple(r[1:])
        for r in con.execute(c4_line_clean_sql("t", "id", "t")).fetchall()
    }
    assert oracle == got

"""Every registered query with an oracle must hash-match DuckDB locally
(the driver repeats this at sf0.01; here we run the smoke SF for speed)."""

import pytest

from spark_sql_hbase_spark.queries import load_all
from tests.oracle import compare

QUERIES = load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    qd = QUERIES[name]
    df = qd.fn(spark, sf_dir)
    assert df is not None
    if qd.oracle is None:
        assert df.count() >= 0  # rows-only smoke
        return
    ok, msg = compare(df, qd.oracle, sf_dir)
    assert ok, f"{name}: {msg}"

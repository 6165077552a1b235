"""CLI REPL (A12 parity): statement accumulation, EXIT handling, dispatch."""

from spark_sql_hbase_spark import cli


def _feeder(lines):
    it = iter(lines)

    def input_fn(prompt):
        try:
            return next(it)
        except StopIteration:
            raise EOFError

    return input_fn


def test_multiline_statement_accumulates():
    stmt = cli.read_statement(_feeder(["SELECT 1", "     + 1 AS x", ";"]))
    assert stmt == "SELECT 1\n     + 1 AS x"


def test_exit_without_semicolon():
    assert cli.read_statement(_feeder(["EXIT"])) == "EXIT"


def test_eof_returns_none():
    assert cli.read_statement(_feeder([])) is None


def test_process_dispatch(spark):
    class Sess:
        def sql(self, s):
            return spark.sql(s)

    assert cli.process(Sess(), "SELECT 1 AS one") is True
    assert cli.process(Sess(), "EXIT") is False
    assert cli.process(Sess(), "quit") is False
    # errors are caught, REPL stays alive
    assert cli.process(Sess(), "SELECT FROM nope") is True


def test_reference_readme_statements_verbatim(spark, tmp_path):
    """The reference README's demo statements (README.md:41-66), run
    statement-for-statement through the REPL's process() with a mounted
    warehouse: show databases / show tables / use pw / insert into ...
    values / select readback — generator overrides the supplied key."""
    from spark_sql_hbase_spark.session import EngineSession

    sess = EngineSession(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    prev = spark.catalog.currentDatabase()
    try:
        # table exists up-front (reference: created via client API / yaml)
        sess.sql(
            "CREATE TABLE pw.test_insert (row_key string, `cf:name` string) "
            "USING keyed OPTIONS (generator='sequence')"
        )
        for stmt in [
            "show databases",
            "show tables",
            "use pw",
            "insert into test_insert  values('0000', 'TestSql')",
            "select * from test_insert",
            "insert into test_insert  values('0000', 'TestSql')",
            "insert into test_insert  values('0000', 'TestSql')",
            "select * from test_insert",
        ]:
            assert cli.process(sess, stmt) is True
        rows = sess.sql("select * from test_insert").collect()
        assert sorted((r.row_key, r["cf:name"]) for r in rows) == [
            ("0001", "TestSql"),
            ("0002", "TestSql"),
            ("0003", "TestSql"),
        ]
    finally:
        spark.catalog.setCurrentDatabase(prev)
        sess.store.drop_table("pw.test_insert")

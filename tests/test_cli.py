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


def test_cli_round6_dml_admin_statement_flow(spark, tmp_path):
    """The round-6 SQL surface end-to-end through the REPL dispatch
    (A12): CREATE INDEX with a fixed-point scale, MERGE, DELETE,
    TRUNCATE — every statement the router grew this round runs as a
    plain ;-terminated CLI statement."""
    from spark_sql_hbase_spark.session import EngineSession

    sess = EngineSession(spark=spark, warehouse_dir=str(tmp_path / "wh"))
    sess.sql("CREATE TABLE cw.t (row_key string, `c:v` double) USING keyed")
    spark.createDataFrame(
        [(f"{i:04d}", float(i) + 0.25) for i in range(8)],
        "row_key string, `c:v` double",
    ).createOrReplaceTempView("__cw_base")
    spark.createDataFrame(
        [("0002", 99.5)], "row_key string, `c:v` double"
    ).createOrReplaceTempView("__cw_updates")
    for stmt in [
        "INSERT INTO cw.t SELECT * FROM __cw_base",
        "CREATE INDEX cw.by_v ON cw.t (`c:v`) "
        "OPTIONS (key_width='8', fixed_point_scale='100')",
        "MERGE INTO cw.t USING __cw_updates ON row_key "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        "DELETE FROM cw.t WHERE `c:v` < 1.0",
        "SELECT * FROM cw.t",
        "TRUNCATE TABLE cw.t",
    ]:
        assert cli.process(sess, stmt) is True
    assert sess.store.read("cw.t").count() == 0
    assert sess.store.read("cw.by_v").count() == 0
    # replay the inserts post-truncate: index fresh again via the
    # insert-path delta maintenance
    assert cli.process(sess, "INSERT INTO cw.t SELECT * FROM __cw_base") is True
    assert sess.store.read("cw.by_v").count() == 8
    got = {r["i:src_key"] for r in sess.store.index_lookup("cw.by_v", 5.25).collect()}
    assert got == {"0005"}

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

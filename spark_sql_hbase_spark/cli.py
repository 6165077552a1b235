"""SQL CLI REPL — the PySpark rebuild of the reference's ``HBaseSQLClient``
(``HBaseSQLClient.scala:31-99``): a console that accumulates multi-line
``;``-terminated statements, keeps history, exits on ``EXIT``/``QUIT``, and
dispatches everything else to ``session.sql(...).show(30)``.

Run: ``python -m spark_sql_hbase_spark.cli [--warehouse DIR] [--registry YML]``
"""

from __future__ import annotations

import argparse
import atexit
import os
import sys

HISTORY_FILE = os.path.expanduser("~/.spark_sql_hbase_spark_history")
PROMPT = "engine> "
CONT_PROMPT = "      > "
SHOW_ROWS = 30  # reference: HBaseSQLClient.scala:98 show(30)
EXIT_WORDS = {"exit", "quit"}  # reference accepts EXIT; QUIT added for comfort


def _install_history() -> None:
    try:
        import readline  # noqa: PLC0415

        try:
            readline.read_history_file(HISTORY_FILE)
        except OSError:
            pass
        atexit.register(readline.write_history_file, HISTORY_FILE)
    except ImportError:
        pass  # no readline (e.g. minimal container) — plain input() still works


def read_statement(input_fn=input) -> str | None:
    """Accumulate input lines until a ``;``-terminated statement (the
    reference's jline loop, ``HBaseSQLClient.scala:56-75``). Returns the
    statement without the trailing ``;``, or None on EOF."""
    buf: list[str] = []
    prompt = PROMPT
    while True:
        try:
            line = input_fn(prompt)
        except EOFError:
            return None
        buf.append(line)
        stmt = "\n".join(buf).strip()
        if stmt.rstrip().endswith(";"):
            return stmt.rstrip().rstrip(";").strip()
        if not buf[0].strip():
            buf.clear()
            continue
        if stmt.lower() in EXIT_WORDS:  # bare EXIT without ';' also works
            return stmt
        prompt = CONT_PROMPT


def process(session, statement: str) -> bool:
    """Execute one statement; returns False when the REPL should stop
    (reference: ``HBaseSQLClient.process``, ``:92-99``)."""
    if statement.lower() in EXIT_WORDS:
        return False
    try:
        session.sql(statement).show(SHOW_ROWS, truncate=False)
    except Exception as exc:  # surface analysis/execution errors, keep the REPL alive
        print(f"Error: {exc}", file=sys.stderr)
    return True


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="spark_sql_hbase_spark SQL REPL")
    parser.add_argument("--warehouse", help="keyed-table warehouse dir to mount")
    parser.add_argument("--registry", help="YAML schema-registry path")
    parser.add_argument("-e", "--execute", help="run one statement and exit")
    args = parser.parse_args(argv)

    from spark_sql_hbase_spark.session import EngineSession

    session = EngineSession(registry_path=args.registry, warehouse_dir=args.warehouse)

    if args.execute:
        process(session, args.execute.rstrip(";"))
        return

    _install_history()
    print("spark_sql_hbase_spark SQL REPL — statements end with ';', EXIT to quit")
    while True:
        stmt = read_statement()
        if stmt is None or not process(session, stmt):
            break
    session.stop()


if __name__ == "__main__":
    main()

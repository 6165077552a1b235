"""Pushdown/pruning verification — SURVEY §2.B.1 as an assertable API.

The reference hand-compiled Catalyst predicates into HBase server-side
filters (``utils/HBaseSparkFilterUtils.scala:23-129``) with known bugs:
silently dropped untranslatable predicates (``:126``), swapped
StartsWith/EndsWith (``:114-120``), unflipped literal-first comparisons
(``:81-112``). Our engine delegates pushdown to Catalyst + the parquet
reader, which always re-evaluates residuals — so correctness is free, and
these helpers exist to *prove* the pushdown actually happens (the plan
shows ``PushedFilters`` and a pruned ``ReadSchema``)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """Spark's explain string for ``df`` — ``mode`` is any of Spark's
    explain modes (simple/extended/codegen/cost/formatted); the ONE
    seam over the private PythonSQLUtils surface (the router's EXPLAIN
    service reuses it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (row-group/page skipping)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", formatted_plan(df)):
        # colon-containing column names render backtick-quoted — normalize
        body = m.group(1).strip().replace("`", "")
        if body:
            # split on top-level commas (filters like In(a, [1,2]) contain commas)
            depth, cur = 0, ""
            for ch in body:
                if ch == "," and depth == 0:
                    out.append(cur.strip())
                    cur = ""
                    continue
                depth += ch in "(["
                depth -= ch in ")]"
                cur += ch
            if cur.strip():
                out.append(cur.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — proves column pruning."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", formatted_plan(df))]


def scan_columns(df: DataFrame) -> set[str]:
    """Column names each scan actually reads, from the scan node's
    ``Output [n]: [name#id, ...]`` list (``ReadSchema`` is ambiguous when
    column names themselves contain ``:``, e.g. ``A:A_00``)."""
    cols: set[str] = set()
    for m in re.finditer(
        r"\(\d+\) Scan [^\n]*\nOutput \[\d+\]: \[([^\]]*)\]", formatted_plan(df)
    ):
        for name in m.group(1).split(", "):
            cols.add(re.sub(r"#\d+[A-Z]*$", "", name.strip()))
    return cols


def assert_pushed(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in some pushed filter."""
    filters = pushed_filters(df)
    joined = " ; ".join(filters)
    for frag in fragments:
        assert frag in joined, f"expected pushed filter {frag!r}; got {filters}"


def assert_pruned_to(df: DataFrame, max_columns: int) -> None:
    cols = scan_columns(df)
    assert len(cols) <= max_columns, f"scan reads {sorted(cols)}; expected ≤{max_columns}"

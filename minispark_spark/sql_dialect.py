"""Dialect pre-pass: reference SQL → Spark SQL.

The reference's PEG grammar (reference ``src/mini_spark/parser.py:14-69``)
is a strict subset of Spark SQL except for two quirks:

1. Tables are quoted file paths: ``FROM 'path/to/table'`` /
   ``JOIN 'path' AS alias`` (``parser.py:60``). We extract the paths,
   register each as a temp view (parquet, or the reference's native
   ``.bin`` BlockFiles through ``sources/blockfile.py``), and
   substitute the view name.
2. ``COUNT()`` takes no argument and is implicitly aliased ``count``
   (``parser.py:23``, ``sql.py:462-464``). We rewrite ``COUNT()`` to
   ``COUNT(*)`` and, when it appears in the select list without an
   explicit alias, add ``AS count``.

Everything else (SELECT/WHERE/JOIN/GROUP BY/HAVING, LIKE, BETWEEN,
arithmetic, aliases) is already valid Spark SQL — Catalyst parses and
optimizes it; we deliberately do NOT build a parser.

Divergences we fix rather than preserve (SURVEY.md §4.3): LEFT/RIGHT/
FULL JOIN execute with real outer semantics (the reference silently
runs INNER, ``parser.py:133``); NOT works (broken in the reference);
float literals stay floats.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

# 'path' optionally followed by AS alias / bare alias, in FROM or JOIN.
_TABLE_REF = re.compile(r"(FROM|JOIN)\s+'([^']+)'", re.IGNORECASE)
_BARE_COUNT = re.compile(r"\bCOUNT\s*\(\s*\)", re.IGNORECASE)
# `+` with a string-literal operand = concatenation in the reference
# (operator.add on str, sql.py:331-333); Spark `+` would null-cast instead.
_CONCAT_PLUS = re.compile(r"('(?:[^']|'')*')\s*\+|\+\s*('(?:[^']|'')*')")


def _view_name_for(path: str, idx: int) -> str:
    base = re.sub(r"\W+", "_", path.rsplit("/", 1)[-1]) or "tbl"
    return f"ms_{base}_{idx}"


def register_path_tables(spark: SparkSession, sql: str) -> str:
    """Replace quoted-path table refs with registered temp views."""

    def sub(m: re.Match[str]) -> str:
        from minispark_spark.sources.tables import read_path

        path = m.group(2)
        view = _view_name_for(path, abs(hash(path)) % 10_000)
        read_path(spark, path).createOrReplaceTempView(view)
        return f"{m.group(1)} {view}"

    return _TABLE_REF.sub(sub, sql)


def rewrite_bare_count(sql: str) -> str:
    """``COUNT()`` → ``COUNT(*)``; add ``AS count`` in the select list
    when no alias follows (mirrors the reference's implicit alias)."""

    out: list[str] = []
    last = 0
    # Only the section before FROM is the select list.
    from_pos = _find_toplevel_from(sql)
    for m in _BARE_COUNT.finditer(sql):
        out.append(sql[last : m.start()])
        rest = sql[m.end() :].lstrip()
        in_select_list = from_pos is None or m.start() < from_pos
        has_alias = rest[:2].upper() == "AS"
        if in_select_list and not has_alias:
            out.append("COUNT(*) AS count")
        else:
            out.append("COUNT(*)")
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def _find_toplevel_from(sql: str) -> int | None:
    m = re.search(r"\bFROM\b", sql, re.IGNORECASE)
    return m.start() if m else None


def rewrite_string_concat_plus(sql: str) -> str:
    """Rewrite ``+`` to ``||`` wherever one operand is a string literal.

    Heuristic (no full parser by design): a ``+`` whose immediate
    neighbor is a quoted literal is concatenation. Chains like
    ``a + ' ' + b`` resolve fully because BOTH pluses touch the
    literal. A ``+`` between two string *columns* can't be detected
    textually — use ``||`` or the DataFrame API for that case.
    """
    prev = None
    while prev != sql:
        prev = sql
        sql = _CONCAT_PLUS.sub(
            lambda m: f"{m.group(1)} ||" if m.group(1) else f"|| {m.group(2)}", sql
        )
    return sql


def translate(spark: SparkSession, sql: str) -> str:
    """Full pre-pass: reference dialect → Spark SQL."""
    sql = sql.strip().rstrip(";")
    sql = register_path_tables(spark, sql)
    sql = rewrite_bare_count(sql)
    sql = rewrite_string_concat_plus(sql)
    return sql

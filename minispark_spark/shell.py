"""Interactive SQL shell — the reference's REPL surface on Spark.

Mirrors reference ``src/mini_spark/shell.py:33-107``: ``;``-terminated
statements, line history, EXPLAIN printed before each run, tabular
output. Implemented with stdlib ``readline``/``input`` only (the
reference uses prompt-toolkit, which is not in this container).

Run: ``python -m minispark_spark.shell`` then e.g.::

    SELECT o_orderstatus, COUNT() AS n
    FROM '/root/testdata/sf0.001/orders.parquet'
    GROUP BY o_orderstatus;
"""

from __future__ import annotations

import sys

from minispark_spark.engine import Engine

PROMPT = "minispark> "
CONT_PROMPT = "        -> "


def read_statement(lines_in=input) -> str | None:
    """Accumulate input lines until a ``;`` terminator (reference
    shell.py reads until the statement ends). Returns None on EOF."""
    buf: list[str] = []
    while True:
        try:
            line = lines_in(PROMPT if not buf else CONT_PROMPT)
        except EOFError:
            return None
        if line is None:
            return None
        buf.append(line)
        joined = "\n".join(buf).strip()
        if joined.endswith(";"):
            return joined[:-1].strip()
        if joined in ("exit", "quit"):
            return joined


def run_statement(engine: Engine, stmt: str, explain: bool = True) -> None:
    df = engine.sql(stmt)
    if explain:
        df.explain()
    df.show(50)


def main() -> int:
    try:
        import readline  # noqa: F401  (line editing + history side effect)
    except ImportError:
        pass
    with Engine(app_name="minispark-shell") as engine:
        engine.spark.sparkContext.setLogLevel("ERROR")
        print("minispark-on-spark SQL shell. Statements end with ';'. exit; quits.")
        while True:
            stmt = read_statement()
            if stmt is None or stmt in ("exit", "quit"):
                return 0
            if not stmt:
                continue
            try:
                run_statement(engine, stmt)
            except Exception as e:  # noqa: BLE001 — REPL must survive bad SQL
                print(f"ERROR: {type(e).__name__}: {e}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())

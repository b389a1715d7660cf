"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive value comparison (exact for ints/strings/timestamps,
exact-bits for doubles — our determinism contract says they must
match bit-for-bit).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
from pyspark.sql import SparkSession

from minispark_spark.registry import REGISTRY, _ensure_loaded
from minispark_spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Driver testdata is one file per table; locally generated
        # scale data (tools/gen_sf1.py et al.) is a directory of parts.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


# Normalized type names: Spark simpleString → canon, DuckDB logical type → canon.
_SPARK_T = {
    "int": "i32", "bigint": "i64", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
}
_SPARK_T.update({f"array<{k}>": f"arr<{v}>" for k, v in list(_SPARK_T.items())})
_DUCK_T = {
    "INTEGER": "i32", "BIGINT": "i64", "SMALLINT": "i16", "TINYINT": "i8",
    "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str", "BOOLEAN": "bool",
    "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "DATE": "date", "HUGEINT": "i128",
}
_DUCK_T.update({f"{k}[]": f"arr<{v}>" for k, v in list(_DUCK_T.items())})


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, name: str, sf_dir: str
) -> tuple[bool, str]:
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_types = {c: _SPARK_T.get(t, t) for c, t in sdf.dtypes}
    s_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        return (len(s_rows) >= 0, f"rows-only: {len(s_rows)} rows")
    rel = con.sql(spec.oracle)
    d_cols = list(rel.columns)
    d_types = {
        c: _DUCK_T.get(str(t), str(t)) for c, t in zip(rel.columns, rel.types)
    }
    d_rows = [tuple(r) for r in rel.fetchall()]
    if sorted(s_cols) != sorted(d_cols):
        return (False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    type_mismatch = {
        c: (s_types[c], d_types[c]) for c in s_cols if s_types[c] != d_types[c]
    }
    if type_mismatch:
        return (False, f"dtypes differ: {type_mismatch}")
    if len(s_rows) != len(d_rows):
        return (False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    sn = _norm_rows(s_cols, s_rows)
    dn = _norm_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return (False, f"values differ; first diffs: {diffs}")
    return (True, f"ok: {len(s_rows)} rows")


def run_all(
    spark: SparkSession, sf_dir: str, subset: list[str] | None = None
) -> dict[str, tuple[bool, str]]:
    """Per-query wall time (Spark run + oracle run + compare) is appended
    to each message so the full-gate budget stays observable per round.
    ``subset``: exact names or name prefixes to restrict the sweep (the
    sf10 scale-proof and targeted re-verification use this)."""
    import time

    _ensure_loaded()
    con = duckdb_conn(sf_dir)
    results = {}
    names = sorted(REGISTRY)
    if subset:
        names = [n for n in names if any(n == s or n.startswith(s) for s in subset)]
    for name in names:
        t0 = time.perf_counter()
        try:
            ok, msg = compare_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(e).__name__}: {e}"
        results[name] = (ok, f"{msg} [{time.perf_counter() - t0:.2f}s]")
    return results


if __name__ == "__main__":
    import sys

    from minispark_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("oracle-check", extra_conf={"spark.ui.enabled": "false"})
    results = run_all(spark, sf, subset=sys.argv[2:] or None)
    failed = 0
    for name, (ok, msg) in results.items():
        status = "PASS" if ok else "FAIL"
        if not ok:
            failed += 1
        print(f"{status} {name}: {msg[:300]}")
    print(f"\n{len(results) - failed}/{len(results)} passed")
    sys.exit(1 if failed else 0)

"""Generate TPC-H lineitem at a given scale factor as multi-file parquet.

Mirrors the reference's data-generation path (reference
`examples/benchmark.py:7-17`: duckdb `dbgen` -> CSV -> BlockFile); here we
emit parquet directly since parquet is our scan format. Output layout
matches /root/testdata/sf*/ (one subdirectory per table) so bench.py and
the registry can point $SPARK_GRAFT_SF_DIR at it unchanged.

Usage: python tools/gen_sf1.py [SF] [OUTDIR]
Defaults: SF=1, OUTDIR=.local/sf1
"""
from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else ".local/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CALL dbgen(sf={sf})")
    # Project lineitem to the driver-testdata schema (TESTDATA.md /
    # /root/testdata/sf*/lineitem.parquet): doubles not decimals,
    # timestamp not date, same 11 columns — so registry queries run
    # unmodified and the math matches the reference's FLOAT columns.
    projections = {
        "lineitem": """
            l_orderkey, l_partkey, l_suppkey,
            CAST(l_linenumber AS INTEGER) AS l_linenumber,
            CAST(l_quantity AS DOUBLE) AS l_quantity,
            CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
            CAST(l_discount AS DOUBLE) AS l_discount,
            CAST(l_tax AS DOUBLE) AS l_tax,
            l_returnflag, l_linestatus,
            CAST(l_shipdate AS TIMESTAMP) AS l_shipdate
        """,
        "orders": """
            o_orderkey, o_custkey, o_orderstatus,
            CAST(o_totalprice AS DOUBLE) AS o_totalprice,
            CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
            o_orderpriority
        """,
        "customer": """
            c_custkey, c_name, c_nationkey,
            CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
        """,
        "supplier": """
            s_suppkey, s_name, s_nationkey,
            CAST(s_acctbal AS DOUBLE) AS s_acctbal
        """,
        "part": """
            p_partkey, p_name, p_brand, p_type, p_size,
            CAST(p_retailprice AS DOUBLE) AS p_retailprice
        """,
        "nation": "n_nationkey, n_name, n_regionkey",
        "region": "r_regionkey, r_name",
    }
    # 32 files so local[32] scans in parallel (single-row-group parquet
    # cannot split; see NOTES.md).
    for table in ("lineitem", "orders", "customer", "supplier", "part",
                  "nation", "region"):
        dest = os.path.join(out, f"{table}.parquet")
        os.makedirs(dest, exist_ok=True)
        n = con.execute(f"SELECT count(*) FROM {table}").fetchone()[0]
        files = 32 if n > 1_000_000 else (8 if n > 10_000 else 1)
        cols = projections.get(table, "*")
        for i in range(files):
            con.execute(
                f"COPY (SELECT {cols} FROM {table} WHERE hash(rowid) % {files} = {i}) "
                f"TO '{dest}/part-{i:05d}.parquet' (FORMAT PARQUET)"
            )
        print(f"{table}: {n} rows -> {files} files", flush=True)


if __name__ == "__main__":
    main()

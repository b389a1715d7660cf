"""Property-based tests (hypothesis) for the pure cross-engine
primitives: the Python-side formulas here must match what the Spark
expressions and DuckDB SQL fragments compute, so pinning their algebra
catches silent contract drift without spinning up a session.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from minispark_spark import sql_dialect
from minispark_spark.functions import hashing

# --- money quantization ----------------------------------------------------


@given(st.integers(min_value=0, max_value=10**13))
def test_floor_cents_equals_decimal_quantization(cents: int):
    """floor(x*100 + 0.5) recovers the integer cents of any 2-decimal
    money value that survived a float64 round trip."""
    x = cents / 100.0
    got = math.floor(x * 100 + 0.5)
    want = int((Decimal(str(x)) * 100).quantize(Decimal("1"), rounding=ROUND_HALF_UP))
    assert got == want == cents


# --- polynomial hash -------------------------------------------------------


def _py_poly_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * hashing.BASE + ord(ch)) % hashing.MOD
    return acc


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=64))
@settings(max_examples=30, deadline=None)
def test_poly_hash_sql_matches_python_fold(s: str):
    sql_literal = "'" + s.replace("'", "''") + "'"
    [(got,)] = duckdb.sql("SELECT " + hashing.poly_hash_sql(sql_literal)).fetchall()
    want = _py_poly_hash(s)
    assert (got or 0) == want


@given(st.text(max_size=64))
def test_poly_hash_stays_in_64bit_range(s: str):
    h = _py_poly_hash(s)
    assert 0 <= h < hashing.MOD
    # combined 3-gram shingle hash stays < MOD too (mod applied per step)
    c = ((h * hashing.COMBINE_BASE + h) % hashing.MOD * hashing.COMBINE_BASE + h) % hashing.MOD
    assert 0 <= c < hashing.MOD


# --- SQL dialect rewrites --------------------------------------------------


@given(st.sampled_from([
    "SELECT COUNT() FROM t",
    "SELECT a, COUNT() FROM t GROUP BY a",
    "SELECT COUNT() AS n FROM t",
    "SELECT a, COUNT() AS n, SUM(b) FROM t GROUP BY a HAVING COUNT() > 2",
]))
def test_bare_count_rewrite_properties(sql: str):
    out = sql_dialect.rewrite_bare_count(sql)
    assert "COUNT()" not in out.replace(" ", "").replace("COUNT( )", "COUNT()")
    # explicit aliases are preserved, not doubled
    assert "AS count AS" not in out
    # HAVING/WHERE occurrences never get an implicit alias
    if "HAVING" in sql:
        head, _, tail = out.partition("HAVING")
        assert "AS count" not in tail


def test_bare_count_idempotent():
    sql = "SELECT a, COUNT() FROM t GROUP BY a"
    once = sql_dialect.rewrite_bare_count(sql)
    assert sql_dialect.rewrite_bare_count(once) == once


@given(st.sampled_from([
    ("SELECT first + ' ' + last FROM u", "SELECT first || ' ' || last FROM u"),
    ("SELECT 'x' + a FROM u", "SELECT 'x' || a FROM u"),
    ("SELECT a + 1 FROM u", "SELECT a + 1 FROM u"),  # numeric + untouched
]))
def test_string_concat_plus_rewrite(case: tuple[str, str]):
    src, want = case
    assert sql_dialect.rewrite_string_concat_plus(src) == want


# --- simhash bit functions -------------------------------------------------


@given(st.integers(min_value=0, max_value=hashing.MOD - 1))
@settings(max_examples=50)
def test_simhash_bits_are_balanced_functions(sh: int):
    """Each affine-mod bit test must stay in range and produce both
    outcomes over the hash domain (no degenerate constant bits)."""
    from minispark_spark.operators.dedup import _SIMHASH_AB, _SIMHASH_T

    for a, b in _SIMHASH_AB[:8]:
        v = (sh * a + b) % hashing.MOD
        assert 0 <= v < hashing.MOD
        assert isinstance(v < _SIMHASH_T, bool)


def test_simhash_bits_not_constant():
    from minispark_spark.operators.dedup import _SIMHASH_AB, _SIMHASH_T

    for a, b in _SIMHASH_AB:
        outcomes = {(h * a + b) % hashing.MOD < _SIMHASH_T for h in range(0, 10**6, 7919)}
        assert outcomes == {True, False}, (a, b)


# --- batched dot product ---------------------------------------------------


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-10, max_value=10, allow_nan=False, width=32
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=30, deadline=None)
def test_dot_batched_matches_sequential_fold_and_duckdb(rows: list[list[float]]):
    """vectors.dot_batched must be a strict left-to-right float64 fold —
    bit-identical to both the Catalyst HOF shape and DuckDB's
    list_reduce (which the oracles use)."""
    import numpy as np
    import pandas as pd

    from minispark_spark.functions import vectors

    a = pd.Series([np.asarray(r, dtype=np.float32) for r in rows])
    b = pd.Series([np.asarray(r[::-1], dtype=np.float32) for r in rows])
    got = vectors.dot_batched.func(a, b)
    for i, (va, vb) in enumerate(zip(a, b)):
        acc = 0.0
        for x, y in zip(va, vb):
            acc = acc + float(x) * float(y)
        assert got[i] == acc, (va, vb)
        # Bind arrays as parameters: a decimal LITERAL would parse via
        # DECIMAL and land 1 ulp off, which real oracles (reading binary
        # parquet values) never see.
        [(want,)] = duckdb.execute(
            "SELECT " + vectors.dot_sql("?::DOUBLE[]", "?::DOUBLE[]"),
            [[float(x) for x in va], [float(y) for y in vb]],
        ).fetchall()
        assert got[i] == want


def test_distributed_ntile_equals_global_window_ntile(spark):
    """operators/ranking.py's distributed ntile (quantile buckets +
    bounded collect + partition-local row_number) must reproduce
    Spark's own global-window ntile(k) bit-for-bit — including skew,
    duplicates, and n % k != 0 remainders — without the single-partition
    sort the window version plans."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from minispark_spark.operators import ranking

    rng = random.Random(42)
    for trial, (n, k) in enumerate([(997, 4), (64, 10), (1000, 7)]):
        # heavy duplication + skew: values from a tiny domain
        rows = [(i, rng.choice([0.0, 1.5, 1.5, 2.25, 9.0, 9.0, 9.0])) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v double").repartition(8)
        cuts = ranking.quantile_cuts(df, ["v"], n_buckets=5)
        b = df.withColumn("_b", ranking.bucket_expr("v", cuts["v"]))
        counts = {
            r["_b"]: r["c"]
            for r in b.groupBy("_b").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        ours = ranking.ntile_over_buckets(b, k, "v", ["id"], "_b", counts, "tile")
        want = df.withColumn("tile", F.ntile(k).over(Window.orderBy("v", "id")))
        got = {(r["id"]): r["tile"] for r in ours.collect()}
        exp = {(r["id"]): r["tile"] for r in want.collect()}
        assert got == exp, f"trial {trial}: distributed ntile diverged"

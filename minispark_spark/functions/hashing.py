"""Deterministic cross-engine hashing primitives.

Spark's built-in hash functions (murmur3 ``hash()``, ``xxhash64``) have
no DuckDB equivalent, so oracle-checked operators (document
fingerprinting, MinHash) use a polynomial rolling hash computed with
identical integer arithmetic in both engines:

    h(s) = fold_{c in s} (acc * 31 + ascii(c)) mod P,  P = 1e9+7

Verified bitwise-identical Spark vs DuckDB. All values stay < 2^35 so
64-bit signed arithmetic never overflows in either engine.

At 100 TB scale this is still the right shape: the fold is a single
JVM-side higher-order-function expression (whole-stage codegen, no
Python), linear in string length, embarrassingly parallel per row.
For non-oracle paths ``F.xxhash64`` is cheaper and preferred.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
BASE = 31

# MinHash permutation parameters h_i(x) = (A_i * x + B_i) mod P.
# Fixed constants (odd multipliers, distinct offsets) embedded in both the
# Spark expressions and the generated DuckDB SQL.
MINHASH_PERMS: list[tuple[int, int]] = [
    ((2_654_435_761 * (i + 1)) % MOD | 1, (40_503 * (i + 7) ** 2) % MOD) for i in range(16)
]


def poly_hash(col: Column) -> Column:
    """Spark expression: polynomial hash of a string column (JVM-side fold)."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * BASE + F.ascii(c)) % MOD,
    )


def poly_hash_sql(expr: str) -> str:
    """DuckDB SQL computing the identical polynomial hash."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({expr}, ''), c -> ascii(c)::BIGINT)), "
        f"(acc, x) -> (acc * {BASE} + x) % {MOD})"
    )


def minhash_perm(hash_col: Column, i: int) -> Column:
    a, b = MINHASH_PERMS[i]
    return (hash_col * F.lit(a) + F.lit(b)) % F.lit(MOD)


def minhash_perm_sql(expr: str, i: int) -> str:
    a, b = MINHASH_PERMS[i]
    return f"(({expr}) * {a} + {b}) % {MOD}"


COMBINE_BASE = 1_000_003


# NOTE deliberately no Spark array-lambda twin for token/shingle hashes:
# element_at(token_hashes(...), i) re-evaluates the whole fold per
# reference (no CSE inside higher-order lambdas) and goes quadratic in
# tokens. The Spark shape is row-based instead — posexplode + poly_hash
# per token + window lead combine (operators/dedup.py::_shingled).


def token_hashes_sql(expr: str) -> str:
    return (
        f"list_transform(string_split_regex(trim({expr}), '\\s+'), "
        f"t -> list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split(t, ''), c -> ascii(c)::BIGINT)), "
        f"(acc, x) -> (acc * {BASE} + x) % {MOD}))"
    )


def shingle_hashes_sql(expr: str, n: int = 3) -> str:
    """DuckDB: distinct word n-gram shingle hashes (combined per-token
    polynomial hashes; values stay < MOD * COMBINE_BASE < 2^50)."""
    acc = "hs[i]"
    for j in range(1, n):
        acc = f"(({acc}) * {COMBINE_BASE} + hs[i+{j}]) % {MOD}"
    return (
        f"(SELECT list_distinct(list_transform(range(1, greatest(len(hs)-{n - 1}, 0)+1), "
        f"i -> {acc})) FROM (SELECT {token_hashes_sql(expr)} AS hs) _th)"
    )


def combine_pair(h1: Column, h2: Column) -> Column:
    """Order-sensitive combination of two hashes (band bucketing)."""
    return (h1 * F.lit(BASE) + h2) % F.lit(MOD)


def combine_pair_sql(e1: str, e2: str) -> str:
    return f"((({e1}) * {BASE} + ({e2})) % {MOD})"

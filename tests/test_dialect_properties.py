"""Property tests for the SQL dialect pre-pass (sql_dialect.py).

The rewrite rules are pure string->string functions, so hypothesis can
hammer them without a SparkSession. The properties pinned here are the
ones a regex-based rewriter can silently lose: idempotence (running
the pre-pass twice must not double-rewrite), no-op on SQL that doesn't
use the reference quirks, and correct aliasing of bare COUNT() in and
out of the select list."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from minispark_spark.sql_dialect import rewrite_bare_count, rewrite_string_concat_plus

idents = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
# plain SQL fragments with no reference quirks (no COUNT(), no quoted-
# literal +): identifiers, commas, comparisons, numbers
plain_sql = st.lists(
    st.one_of(
        idents,
        st.sampled_from([",", "=", "<", ">", "*", "SELECT", "FROM", "WHERE",
                         "GROUP BY", "AND", "1", "42", "COUNT(x)", "SUM(y)"]),
    ),
    min_size=1,
    max_size=12,
).map(" ".join)


@given(plain_sql)
@settings(max_examples=200, deadline=None)
def test_rewrites_are_noop_without_quirks(sql):
    assert rewrite_bare_count(sql) == sql
    assert rewrite_string_concat_plus(sql) == sql


@given(plain_sql, st.integers(0, 3))
@settings(max_examples=200, deadline=None)
def test_bare_count_rewrite_is_idempotent(sql, n):
    s = sql + " COUNT() " * n + " FROM t"
    once = rewrite_bare_count(s)
    assert rewrite_bare_count(once) == once
    assert "COUNT()" not in once.replace("COUNT( )", "COUNT()")


@given(idents)
@settings(max_examples=100, deadline=None)
def test_bare_count_alias_only_in_select_list(col):
    # select list: implicit alias added
    out = rewrite_bare_count(f"SELECT {col}, COUNT() FROM t GROUP BY {col}")
    assert "COUNT(*) AS count" in out
    # explicit alias respected
    out2 = rewrite_bare_count(f"SELECT COUNT() AS n FROM t")
    assert "COUNT(*) AS n" in out2 and "AS count" not in out2
    # HAVING position (after FROM): no alias injected
    out3 = rewrite_bare_count(f"SELECT {col} FROM t GROUP BY {col} HAVING COUNT() > 1")
    assert "COUNT(*) > 1" in out3 and "AS count" not in out3


@given(
    idents,
    st.text(
        # a + INSIDE the literal must be preserved, so keep it out of
        # the generated literal and assert none survives OUTSIDE one
        alphabet=st.characters(blacklist_characters="'\\+", max_codepoint=126),
        max_size=8,
    ),
)
@settings(max_examples=200, deadline=None)
def test_concat_plus_rewrite_idempotent_and_complete(col, lit):
    s = f"SELECT {col} + '{lit}' + {col} FROM t"
    once = rewrite_string_concat_plus(s)
    # both pluses touch the literal -> both rewritten, nothing left
    assert "+" not in once
    assert rewrite_string_concat_plus(once) == once


def test_concat_plus_handles_escaped_quotes():
    out = rewrite_string_concat_plus("SELECT a + 'it''s' FROM t")
    assert out == "SELECT a || 'it''s' FROM t"

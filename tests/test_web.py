"""Rule-level tests for the web-crawl curation family (plans/web.py) —
the oracle-parity gate proves cross-engine equality; these pin the
individual normalization rules to hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from minispark_spark.plans.web import _canon_col, _strip_col


def _one(spark, expr, **cols):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} string" for k in cols)
    )
    return df.select(expr.alias("out")).collect()[0]["out"]


def test_url_canonicalization_rules(spark):
    cases = {
        # fragment stripped, host lowercased
        "https://WWW.src1.Example.COM/a/7#top": "https://src1.example.com/a/7",
        # default port and www stripped
        "https://www.s.example.com:443/a/1": "https://s.example.com/a/1",
        # all utm params stripped, including a then-empty '?'
        "https://s.example.com/a/1?utm_source=feed&utm_campaign=x": "https://s.example.com/a/1",
        # non-tracking params kept
        "https://s.example.com/a/1?ref=2": "https://s.example.com/a/1?ref=2",
        # already canonical -> unchanged
        "https://s.example.com/a/1": "https://s.example.com/a/1",
    }
    for raw, want in cases.items():
        got = _one(spark, _canon_col(F.col("u")), u=raw)
        assert got == want, f"{raw}: {got} != {want}"


def test_url_blocklist_prefix_semantics(spark, sf_dir):
    """Rule 1 (src3.example.com, /a/1) must block /a/1 AND /a/10../a/19
    (path-PREFIX match, not path equality), and nothing else on that
    host; rule 2 blocks all of src7.example.com."""
    from minispark_spark.plans.web import docs_url_blocklist_filter

    rows = docs_url_blocklist_filter(spark, sf_dir).collect()
    by_host = {}
    for r in rows:
        host = r["canon_url"].split("://")[1].split("/")[0]
        by_host.setdefault(host, []).append(r)
    for r in by_host.get("src3.example.com", []):
        path_key = r["canon_url"].split("/a/")[1].split("?")[0]
        want = path_key == "1" or path_key.startswith("1")
        assert r["blocked"] == want, r
        assert (r["rule_id"] == 1) == want
    s7 = by_host.get("src7.example.com", [])
    assert s7 and all(r["blocked"] and r["rule_id"] == 2 for r in s7)
    clean = by_host.get("src5.example.com", [])
    assert clean and all(not r["blocked"] and r["rule_id"] is None for r in clean)


def test_html_strip_rules(spark):
    html = (
        '<html><head><title>T</title><style>p{color:red}</style>'
        '<script>var x = "1 < 2";</script></head>'
        "<body><p>hello   world</p><footer>A &amp; B &lt;3</footer></body></html>"
    )
    got = _one(spark, _strip_col(F.col("h")), h=html)
    # script/style content gone (including the '<' inside the script
    # string, which would derail a naive tag stripper), tags stripped,
    # entities decoded, whitespace collapsed, ends trimmed.
    assert got == "T hello world A & B <3"

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
    from minispark_spark.session import get_spark

    spark = get_spark("web-test", extra_conf={"spark.ui.enabled": "false"})
    for raw, want in cases.items():
        got = _one(spark, _canon_col(F.col("u")), u=raw)
        assert got == want, f"{raw}: {got} != {want}"


def test_html_strip_rules(spark):
    from minispark_spark.session import get_spark

    spark = get_spark("web-test", extra_conf={"spark.ui.enabled": "false"})
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

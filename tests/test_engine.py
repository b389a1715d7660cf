"""Engine facade + SQL dialect pre-pass unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minispark_spark.dataframe import Col, count_
from minispark_spark.engine import Engine
from minispark_spark.sql_dialect import rewrite_bare_count, rewrite_string_concat_plus
from tests.fixtures import write_fruits


@pytest.fixture(scope="module")
def fruits_path(spark, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("engine") / "fruits")
    write_fruits(spark, path)
    return path


def test_bare_count_rewrite_select_list():
    assert (
        rewrite_bare_count("SELECT country, COUNT() FROM t GROUP BY country")
        == "SELECT country, COUNT(*) AS count FROM t GROUP BY country"
    )


def test_bare_count_rewrite_having_no_alias():
    out = rewrite_bare_count("SELECT a, COUNT() AS c FROM t GROUP BY a HAVING COUNT() > 1")
    assert out == "SELECT a, COUNT(*) AS c FROM t GROUP BY a HAVING COUNT(*) > 1"


def test_concat_plus_rewrite():
    assert (
        rewrite_string_concat_plus("SELECT a + ' ' + b AS full FROM t")
        == "SELECT a || ' ' || b AS full FROM t"
    )
    # arithmetic untouched
    assert rewrite_string_concat_plus("SELECT age + 5 FROM t") == "SELECT age + 5 FROM t"


def test_headline_fruits_query(spark, fruits_path):
    """The reference README headline query (README.md:117-129) verbatim."""
    with Engine(spark) as engine:
        rows = engine.sql(
            f"SELECT fruit, SUM(quantity) AS total FROM '{fruits_path}' GROUP BY fruit;"
        ).collect()
    assert sorted((r["fruit"], r["total"]) for r in rows) == [
        ("apple", 7),
        ("banana", 12),
        ("orange", 2),
    ]


def test_dataframe_veneer_chain(spark, fruits_path):
    with Engine(spark) as engine:
        df = (
            engine.table(fruits_path)
            .filter(Col("quantity") > 2)
            .group_by("fruit")
            .agg(count_(), F.sum("quantity").alias("q"))
        )
        rows = df.collect()
    assert {r["fruit"]: (r["count"], r["q"]) for r in rows} == {
        "apple": (2, 7),
        "banana": (2, 12),
    }


def test_veneer_schema_and_explain(spark, fruits_path, capsys):
    with Engine(spark) as engine:
        df = engine.table(fruits_path).select("fruit", "quantity")
        assert df.schema == [("fruit", "string"), ("quantity", "int")]
        df.explain(full=True)
    assert "Physical Plan" in capsys.readouterr().out


def test_collect_limit(spark, fruits_path):
    with Engine(spark) as engine:
        assert len(engine.table(fruits_path).collect(limit=2)) == 2


def test_shell_statement_accumulation():
    from minispark_spark import shell

    feeds = iter(["SELECT 1 AS x", "FROM t;", "exit"])
    stmt = shell.read_statement(lambda _p: next(feeds))
    assert stmt == "SELECT 1 AS x\nFROM t"
    assert shell.read_statement(lambda _p: next(feeds)) == "exit"
    assert shell.read_statement(lambda _p: (_ for _ in ()).throw(EOFError())) is None


def test_shell_run_statement(spark, sf_dir, capsys):
    from minispark_spark import shell
    from minispark_spark.engine import Engine

    eng = Engine(spark=spark)
    shell.run_statement(
        eng,
        f"SELECT COUNT() AS n FROM '{sf_dir}/region.parquet'",
        explain=False,
    )
    out = capsys.readouterr().out
    assert "n" in out and "5" in out


def test_ddl_create_insert_select(spark, tmp_path):
    """DDL flows through Engine.sql unchanged: CREATE TABLE AS over a
    parquet-backed view, INSERT INTO, then query — surface the reference
    lacks entirely (SURVEY §2.4 'no INSERT/UPDATE/DDL')."""
    from minispark_spark.engine import Engine

    eng = Engine(spark)
    spark.sql("DROP TABLE IF EXISTS ddl_demo")
    eng.sql(
        "CREATE TABLE ddl_demo USING parquet AS SELECT 1 AS id, 'a' AS tag"
    )
    eng.sql("INSERT INTO ddl_demo VALUES (2, 'b'), (3, 'c')")
    rows = eng.execute_sql("SELECT id, tag FROM ddl_demo")
    assert sorted((r["id"], r["tag"]) for r in rows) == [(1, "a"), (2, "b"), (3, "c")]
    spark.sql("DROP TABLE ddl_demo")


def test_sql_over_native_blockfile_table(spark, tmp_path):
    """The reference README's headline query, verbatim, over a table in
    the reference's own on-disk format (reference README.md:117-129
    writes 'fruits' as a BlockFile): FROM '<path>.bin' routes through
    the blockfile DataSource."""
    from minispark_spark.engine import Engine
    from minispark_spark.sources import blockfile as bf

    bf.register(spark)
    fruits = spark.createDataFrame(
        [("apple", 3, 1.5), ("banana", 5, 1.9), ("orange", 2, 1.2), ("orange", 4, 2.2)],
        "fruit string, quantity int, price float",
    )
    path = str(tmp_path / "fruits.bin")
    fruits.coalesce(1).write.format("blockfile").mode("overwrite").save(path)

    with Engine(spark) as engine:
        rows = engine.sql(
            f"SELECT fruit, SUM(quantity * price) AS total_price FROM '{path}' GROUP BY fruit"
        ).collect()
    got = {r["fruit"]: round(r["total_price"], 2) for r in rows}
    assert got == {"apple": 4.5, "banana": 9.5, "orange": 11.2}


def test_register_tables_enables_plain_sql(spark, sf_dir):
    from minispark_spark.engine import Engine

    eng = Engine(spark)
    views = eng.register_tables(sf_dir, ["region", "documents"])
    assert views == ["region", "documents"]
    rows = eng.execute_sql("SELECT COUNT() AS n FROM region")
    assert rows == [{"n": 5}]
    joined = eng.execute_sql(
        "SELECT COUNT() AS n FROM documents WHERE source = 'src0'"
    )
    assert joined[0]["n"] > 0

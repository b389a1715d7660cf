"""Z-order layout: values preserved, and parquet min/max stats actually
become skippable (measured from file footers, not asserted on faith)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from minispark_spark.sources.layout import write_zordered
from minispark_spark.sources.tables import load_table


def _stats_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet file under ``path``."""
    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        if los:
            ranges.append((min(los), max(his)))
    return ranges


def _files_containing(ranges: list[tuple], point) -> int:
    return sum(1 for lo, hi in ranges if lo <= point <= hi)


def test_zorder_preserves_values_and_skips(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    z_path = str(tmp_path / "z")
    rr_path = str(tmp_path / "rr")
    write_zordered(ev, z_path, ["user_id", "value"], num_files=8)
    ev.repartition(8).write.mode("overwrite").parquet(rr_path)

    back = spark.read.parquet(z_path)
    assert back.count() == ev.count()
    assert back.agg({"event_id": "sum"}).collect() == ev.agg({"event_id": "sum"}).collect()

    # A point lookup on EITHER clustered column must touch fewer files
    # than the round-robin layout (which smears every key everywhere).
    probe_user = ev.selectExpr("percentile(user_id, 0.5)").collect()[0][0]
    probe_value = ev.selectExpr("percentile(value, 0.5)").collect()[0][0]
    for col, probe in (("user_id", int(probe_user)), ("value", probe_value)):
        z_hits = _files_containing(_stats_ranges(z_path, col), probe)
        rr_hits = _files_containing(_stats_ranges(rr_path, col), probe)
        assert z_hits < rr_hits, (col, z_hits, rr_hits)

"""Z-order layout: the written files' parquet footer stats must be
tight on BOTH clustered columns — that tightness IS the data skipping
(Spark prunes row groups/files whose min/max exclude the predicate).
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from databeats_spark.operators.layout import zorder_write
from databeats_spark.sources.tables import load_tables
from tests.conftest import SF_SMOKE


def stats_coverage(path: str, col: str) -> float:
    """Mean fraction of the column's global range each row group
    covers — 1.0 means every row group spans everything (no skipping
    possible), near 0 means tight clustering."""
    spans, mns, mxs = [], [], []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
            mns.append(st.min)
            mxs.append(st.max)
    lo, hi = min(mns), max(mxs)
    width = (hi - lo) or 1
    return sum((b - a) / width for a, b in spans) / len(spans)


def test_zorder_tightens_stats_on_both_columns(spark, tmp_path):
    ev = load_tables(spark, SF_SMOKE, ["events"]).events.select(
        "event_id", "user_id", "value"
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zord")
    ev.repartition(8).write.parquet(plain)
    zorder_write(ev, zpath, cols=["user_id", "value"], n_files=8)

    for col in ("user_id", "value"):
        before = stats_coverage(plain, col)
        after = stats_coverage(zpath, col)
        # random layout: every file spans ~the full range; z-order:
        # each file covers a small rectangle in BOTH dimensions
        assert before > 0.5, (col, before)
        assert after < 0.6 * before, (col, before, after)


def test_zorder_preserves_rows(spark, tmp_path):
    ev = load_tables(spark, SF_SMOKE, ["events"]).events.select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "zro")
    zorder_write(ev, zpath, cols=["user_id", "value"], n_files=4)
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
    assert back.agg({"event_id": "sum"}).first()[0] == ev.agg({"event_id": "sum"}).first()[0]


def test_single_value_column_degrades_gracefully(spark, tmp_path):
    ev = load_tables(spark, SF_SMOKE, ["events"]).events
    one = ev.select("event_id", "user_id").withColumn("k", ev["user_id"] * 0)
    zorder_write(one, str(tmp_path / "deg"), cols=["k", "user_id"], n_files=2)
    back = spark.read.parquet(str(tmp_path / "deg"))
    assert back.count() == one.count()

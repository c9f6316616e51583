"""Partition pruning on the week-partitioned history table — the scan
must read only the filtered week's directory (the property that makes
week-scoped queries O(week) instead of O(history) at 100 TB)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from databeats_spark.plans.etl import transform, write_history
from tests.spotify_fixtures import T0, WEEK, gen_spotify


def test_week_filter_prunes_partitions(spark, tmp_path):
    tracks, artists, albums, audio = gen_spotify(n_weeks=6)
    out = transform(
        spark.createDataFrame(tracks),
        spark.createDataFrame(artists),
        spark.createDataFrame(albums),
        spark.createDataFrame(audio),
        as_of_unix=T0 + 6 * WEEK,
    )
    hist = str(tmp_path / "hist")
    write_history(out.tracks, hist)

    df = spark.read.parquet(hist)
    one_week = df.filter(F.col("__week") == "2024-01-29")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_week.explain("formatted")
    plan = buf.getvalue()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "__week" in pf[0], plan

    # ground truth: the scan reads only the one matching directory
    n_selected = one_week.select(F.input_file_name()).distinct().count()
    import os

    files_in_partition = [
        f
        for f in os.listdir(os.path.join(hist, "__week=2024-01-29"))
        if f.endswith(".parquet")
    ]
    assert n_selected <= len(files_in_partition)
    assert one_week.count() > 0

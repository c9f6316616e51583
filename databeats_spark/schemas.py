"""Explicit StructTypes for the reference data model.

The reference never declares schemas — frames are shaped by
construction and aligned by projecting onto historical columns
(reference dag.py:449-452), silently dropping anything new. Declaring
them up front gives scan pruning, stable casts, and loud failures.

Column sets follow SURVEY.md §1 (tracks dag.py:197-206, artists
dag.py:244-252, albums dag.py:308-319, audio dag.py:353-363 +
recommendation.py:14-35).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRACKS_SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.StringType(), False),
        T.StructField("artist_id", T.StringType(), True),
        T.StructField("track_name", T.StringType(), True),
        T.StructField("popularity", T.IntegerType(), True),
        T.StructField("album_id", T.StringType(), True),
        T.StructField("timestamp", T.LongType(), False),  # unix sec, Monday week start
    ]
)

ARTISTS_SCHEMA = T.StructType(
    [
        T.StructField("artist_id", T.StringType(), False),
        T.StructField("artist_name", T.StringType(), True),
        T.StructField("genre", T.ArrayType(T.StringType()), True),
        T.StructField("popularity", T.IntegerType(), True),
        T.StructField("timestamp", T.LongType(), False),
    ]
)

ALBUMS_SCHEMA = T.StructType(
    [
        T.StructField("album_id", T.StringType(), False),
        T.StructField("artist_id", T.StringType(), True),
        T.StructField("album_name", T.StringType(), True),
        T.StructField("total_tracks", T.IntegerType(), True),
        T.StructField("release_date", T.StringType(), True),  # may be partial: YYYY / YYYY-MM
        T.StructField("popularity", T.IntegerType(), True),
        T.StructField("timestamp", T.LongType(), False),
    ]
)

AUDIO_FEATURE_COLS = (
    "danceability",
    "energy",
    "key",
    "loudness",
    "mode",
    "speechiness",
    "acousticness",
    "instrumentalness",
    "liveness",
    "valence",
    "tempo",
    "duration_ms",
    "time_signature",
)

AUDIO_SCHEMA = T.StructType(
    [T.StructField("track_id", T.StringType(), False)]
    + [
        T.StructField(c, T.LongType() if c == "duration_ms" else (T.IntegerType() if c in ("key", "mode", "time_signature") else T.DoubleType()), True)
        for c in AUDIO_FEATURE_COLS
    ]
    # present in the raw API payload, dropped by the pipeline
    # (reference dag.py:480-483) — kept here to exercise column pruning
    + [
        T.StructField("uri", T.StringType(), True),
        T.StructField("track_href", T.StringType(), True),
        T.StructField("analysis_url", T.StringType(), True),
    ]
)

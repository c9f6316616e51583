"""End-to-end §3.2: ETL snapshot → weekly retrain → persisted model
that predicts on fresh data."""

from __future__ import annotations

from pyspark.ml import PipelineModel

from databeats_spark.plans.etl import transform, write_snapshot
from databeats_spark.plans.training import weekly_retrain
from tests.spotify_fixtures import T0, WEEK, gen_spotify


def test_weekly_retrain_end_to_end(spark, tmp_path):
    tracks, artists, albums, audio = gen_spotify(n_tracks=300, n_weeks=4)
    out = transform(
        spark.createDataFrame(tracks),
        spark.createDataFrame(artists),
        spark.createDataFrame(albums),
        spark.createDataFrame(audio),
        as_of_unix=T0 + 4 * WEEK,
    )
    snap = str(tmp_path / "snapshot")
    write_snapshot(out.tracks, snap)

    model_path = str(tmp_path / "model")
    res = weekly_retrain(spark, snap, model_path, algo="lr")
    assert res.n_rows > 100
    # planted signal: popularity ~ f(danceability, energy) + N(0,8)
    assert res.rmse < 15

    loaded = PipelineModel.load(model_path)
    preds = loaded.transform(spark.read.parquet(snap).limit(20)).select("prediction")
    vals = [r["prediction"] for r in preds.collect()]
    assert len(vals) == 20
    assert all(-50 <= v <= 150 for v in vals)

"""Tolerance-gated ML tests (SURVEY §5: ML is excluded from
hash-matching — gates are metric bounds + seeded reproducibility)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databeats_spark.ml.ann import IVFIndex
from databeats_spark.ml.recommender import SongRecommender
from databeats_spark.ml.regression import feature_importances, train_popularity_model
from tests.conftest import SF_SMOKE
from tests.spotify_fixtures import gen_spotify


@pytest.fixture(scope="module")
def corpus(spark):
    tracks, _, _, audio = gen_spotify(n_tracks=400, n_weeks=4, seed=3)
    st = spark.createDataFrame(tracks)
    sau = spark.createDataFrame(audio)
    merged = SongRecommender.preprocess(st, sau).cache()
    merged.count()
    return st, sau, merged


def test_regression_beats_mean_predictor(spark, corpus):
    _, _, merged = corpus
    stats = merged.agg(F.stddev("popularity").alias("sd")).collect()[0]
    trained = train_popularity_model(merged, algo="rf", cv_folds=2)
    # planted signal: popularity ≈ 60*dance + 30*energy + N(0,8).
    # A real model must come well under the mean predictor (RMSE ≈ sd)
    assert trained.rmse < 0.75 * stats["sd"], (trained.rmse, stats["sd"])
    assert trained.rmse > 1.0  # and can't be impossibly perfect

    imp = feature_importances(trained)
    top2 = sorted(imp, key=imp.get, reverse=True)[:2]
    assert set(top2) == {"danceability", "energy"}, imp


def test_regression_linear_and_save_load(spark, corpus, tmp_path):
    _, _, merged = corpus
    trained = train_popularity_model(merged, algo="lr", cv_folds=2)
    assert trained.rmse < 12  # noise sd is 8; linear model ~ that scale

    path = str(tmp_path / "lr_model")
    trained.model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    loaded = PipelineModel.load(path)
    pred = loaded.transform(merged.limit(10)).select("prediction").collect()
    assert len(pred) == 10


def test_regression_gbt_path(spark, corpus):
    _, _, merged = corpus
    stats = merged.agg(F.stddev("popularity").alias("sd")).collect()[0]
    trained = train_popularity_model(merged, algo="gbt", cv_folds=2)
    assert trained.rmse < 0.8 * stats["sd"]


def test_recommender_formatting(spark, corpus):
    from databeats_spark.ml.recommender import format_recommendations

    st, sau, _ = corpus
    rec = SongRecommender.fit(st, sau)
    names = [r["track_name"] for r in rec.labeled.limit(2).collect()]
    lines = format_recommendations(rec.recommend(names, k=5))
    assert 0 < len(lines) <= 5
    assert lines[0].startswith("1. ")
    assert all(" — " in l for l in lines)


def test_regression_seeded_reproducibility(spark, corpus):
    _, _, merged = corpus
    a = train_popularity_model(merged, algo="rf", cv_folds=2, seed=7)
    b = train_popularity_model(merged, algo="rf", cv_folds=2, seed=7)
    assert a.rmse == pytest.approx(b.rmse, abs=1e-9)


def test_recommender(spark, corpus):
    st, sau, merged = corpus
    rec = SongRecommender.fit(st, sau)
    # pick two existing names
    names = [r["track_name"] for r in rec.labeled.limit(2).collect()]
    out = rec.recommend(names).toPandas()
    assert 0 < len(out) <= 20
    assert not set(out["track_name"]) & set(names)  # inputs excluded (W6)
    assert out["track_name"].is_unique
    # deterministic across calls
    out2 = rec.recommend(names).toPandas()
    assert out.equals(out2)


def test_recommender_save_load(spark, corpus, tmp_path):
    st, sau, _ = corpus
    rec = SongRecommender.fit(st, sau)
    path = str(tmp_path / "recommender")
    rec.save(path)
    from pyspark.ml import PipelineModel

    loaded = PipelineModel.load(path)
    assert loaded.stages[-1].getK() == rec.model.stages[-1].getK()


def test_ivf_recall_vs_exact(spark):
    from databeats_spark.functions.similarity import cosine_top_k
    from databeats_spark.sources.tables import load_tables

    t = load_tables(spark, SF_SMOKE, ["embeddings"])
    emb = t.embeddings.cache()
    queries = emb.filter(F.col("vec_id") < 10)

    exact = cosine_top_k(emb, queries, k=10).toPandas()
    idx = IVFIndex.fit(emb, n_lists=8)
    approx = idx.search(queries, k=10, n_probe=4).toPandas()

    exact_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
    approx_sets = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / 10 for q in exact_sets.index
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"IVF recall too low: {mean_recall} ({recalls})"


def test_ivf_partitioned_write(spark, tmp_path):
    from databeats_spark.sources.tables import load_tables

    t = load_tables(spark, SF_SMOKE, ["embeddings"])
    idx = IVFIndex.fit(t.embeddings, n_lists=4)
    path = str(tmp_path / "ivf")
    idx.write_partitioned(path)
    import os

    parts = [p for p in os.listdir(path) if p.startswith("centroid_id=")]
    assert len(parts) == 4


def test_lang_classifier_distills_heuristic(spark):
    from databeats_spark.functions.text import lang_guess
    from databeats_spark.ml.text import train_lang_classifier
    from databeats_spark.sources.tables import load_tables
    from tests.conftest import SF_CORRECT

    docs = load_tables(spark, SF_CORRECT, ["documents"]).documents
    # weak supervision: the rule-based labeler provides the target —
    # the learned hashed-TF model must reproduce it on held-out docs
    weak = docs.withColumn("weak_lang", lang_guess("text"))
    clf = train_lang_classifier(weak, seed=7, label_col="weak_lang")
    assert clf.accuracy >= 0.85, clf.accuracy
    scored = clf.score(docs.limit(50))
    assert scored.count() == 50
    assert set(scored.columns) == {"doc_id", "pred_lang"}


def test_lang_classifier_seeded_reproducibility(spark):
    from databeats_spark.ml.text import train_lang_classifier
    from databeats_spark.sources.tables import load_tables
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents
    a = train_lang_classifier(docs, seed=11)
    b = train_lang_classifier(docs, seed=11)
    assert a.accuracy == b.accuracy

"""PCA reduction gates for the ANN ladder (ml/reduce.py).

The testdata embeddings are near-isotropic (measured cumulative
variance: 0.20@8 / 0.38@16 / 0.65@32 of 64 dims) — the worst case for
any linear reduction, so recall gates there would pin noise. The
operator property that must hold regardless of corpus is "PCA recovers
a low-rank signal subspace": a seeded planted fixture (clusters in a
rank-r subspace + small isotropic noise) where reduced-space search
must reproduce full-space neighbors almost exactly. The real-testdata
checks pin the variance accounting and the drop-in plumbing into
cosine_top_k / IVFIndex instead.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from databeats_spark.functions.similarity import cosine_top_k
from databeats_spark.ml.ann import IVFIndex
from databeats_spark.ml.reduce import PCAReducer
from databeats_spark.sources.tables import load_tables
from tests.conftest import SF_SMOKE

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


@pytest.fixture(scope="module")
def planted(spark):
    """300 vectors in 64 dims whose signal lives in a rank-6 subspace:
    10 cluster centers drawn in the subspace, per-point jitter inside
    it, plus tiny full-dimensional noise. PCA(k=8) must find it."""
    rng = np.random.default_rng(7)
    basis, _ = np.linalg.qr(rng.normal(size=(64, 6)))  # orthonormal 64x6
    centers = rng.normal(scale=4.0, size=(10, 6))
    rows = []
    for i in range(300):
        c = centers[i % 10] + rng.normal(scale=0.5, size=6)
        v = basis @ c + rng.normal(scale=0.02, size=64)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, SCHEMA).cache()


def test_pca_recovers_planted_subspace(spark, planted):
    red = PCAReducer.fit(planted, k=8)
    # rank-6 signal + tiny noise: 8 components must capture nearly all
    assert sum(red.explained_variance()) >= 0.97
    proj = red.transform(planted).cache()
    queries = planted.filter(F.col("vec_id") < 15)
    exact = cosine_top_k(planted, queries, k=10).toPandas()
    approx = cosine_top_k(proj, proj.filter(F.col("vec_id") < 15), k=10).toPandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e.index]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_explained_variance_contract(spark):
    emb = load_tables(spark, SF_SMOKE, ["embeddings"]).embeddings
    red = PCAReducer.fit(emb, k=32)
    ev = red.explained_variance()
    assert len(ev) == 32 and red.k == 32
    # components come variance-ordered and ratios sum below 1
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    assert 0.0 < sum(ev) <= 1.0 + 1e-9
    # measured 0.651 on this corpus; generous floor guards regressions
    # (e.g. fitting on an unspread/empty frame or wrong column)
    assert sum(ev) >= 0.5


def test_reduced_vectors_feed_ivf_end_to_end(spark):
    emb = load_tables(spark, SF_SMOKE, ["embeddings"]).embeddings
    red = PCAReducer.fit(emb, k=16)
    proj = red.transform(emb).cache()
    # schema stays drop-in: same id col, array-typed vec col
    assert dict(proj.dtypes)["embedding"] == "array<double>"
    idx = IVFIndex.fit(proj, n_lists=8, max_iter=4, init_mode="random")
    res = idx.search(proj.filter(F.col("vec_id") < 5), k=5, n_probe=4).toPandas()
    assert set(res["query_id"]) == {0, 1, 2, 3, 4}
    assert (res.groupby("query_id").size() == 5).all()
    assert (res["cos_sim"] <= 1.0 + 1e-9).all()


def test_ivf_save_load_roundtrip(spark, tmp_path):
    """Full index persistence: a reopened index must return the exact
    search results of the in-memory one (same centroids, same corpus)."""
    from databeats_spark.sources.tables import load_tables

    emb = load_tables(spark, SF_SMOKE, ["embeddings"]).embeddings
    idx = IVFIndex.fit(emb, n_lists=8, max_iter=4, init_mode="random")
    idx.save(str(tmp_path / "ivf"))
    reopened = IVFIndex.load(spark, str(tmp_path / "ivf"))
    q = emb.filter(F.col("vec_id") < 5)
    a = idx.search(q, k=5, n_probe=3).toPandas().sort_values(["query_id", "rank"])
    b = reopened.search(q, k=5, n_probe=3).toPandas().sort_values(["query_id", "rank"])
    assert list(a["neighbor_id"]) == list(b["neighbor_id"])
    assert (a["cos_sim"].values == b["cos_sim"].values).all()


def test_ivf_save_load_records_fit_columns(spark, tmp_path):
    """An index fit with non-default column names (the encode_payloads
    path uses id_col='doc_id') must reopen without the caller repeating
    them — save() writes a metadata JSON that load() reads (ADVICE r6)."""
    from databeats_spark.sources.tables import load_tables

    emb = (
        load_tables(spark, SF_SMOKE, ["embeddings"])
        .embeddings.withColumnRenamed("vec_id", "doc_id")
        .withColumnRenamed("embedding", "vec")
    )
    idx = IVFIndex.fit(emb, id_col="doc_id", vec_col="vec", n_lists=4,
                       max_iter=2, init_mode="random")
    idx.save(str(tmp_path / "ivf_meta"))
    reopened = IVFIndex.load(spark, str(tmp_path / "ivf_meta"))
    assert (reopened.id_col, reopened.vec_col) == ("doc_id", "vec")
    res = reopened.search(emb.filter(F.col("doc_id") < 3), k=3, n_probe=2).toPandas()
    assert set(res["query_id"]) == {0, 1, 2}


def test_ivf_load_distinguishes_broken_meta_from_absent(spark, tmp_path):
    """Three load branches (ADVICE r7, hardened r8): a pre-metadata
    artifact (no meta/ dir) falls back to the legacy default columns; a
    meta/ dir that EXISTS but yields no parseable rows (crashed save,
    _SUCCESS only) is a broken artifact and must raise rather than
    silently reopen with the wrong columns; explicit caller arguments
    still override a broken meta. Presence is checked on the filesystem,
    not inferred from the read exception — spark.read.json raises the
    same AnalysisException for both cases."""
    from databeats_spark.sources.tables import load_tables

    emb = load_tables(spark, SF_SMOKE, ["embeddings"]).embeddings
    idx = IVFIndex.fit(emb, n_lists=4, max_iter=2, init_mode="random")
    p = tmp_path / "ivf_broken"
    idx.save(str(p))

    # (a) pre-metadata artifact: remove meta/ entirely → legacy fallback
    import shutil

    shutil.rmtree(p / "meta")
    legacy = IVFIndex.load(spark, str(p))
    assert (legacy.id_col, legacy.vec_col) == ("vec_id", "embedding")

    # (b) broken artifact: meta/ exists but holds only _SUCCESS → raise
    (p / "meta").mkdir()
    (p / "meta" / "_SUCCESS").touch()
    with pytest.raises(ValueError, match="unreadable IVF index metadata"):
        IVFIndex.load(spark, str(p))

    # (c) explicit arguments override a broken meta
    forced = IVFIndex.load(spark, str(p), id_col="vec_id", vec_col="embedding")
    assert (forced.id_col, forced.vec_col) == ("vec_id", "embedding")

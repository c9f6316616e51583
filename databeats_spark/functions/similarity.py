"""Vector-similarity functions and ANN search over embedding columns.

Embeddings live as ``array<float>`` columns (the driver's
embeddings.parquet). Dot/norm/cosine are pure ``zip_with`` /
``aggregate`` expressions (JVM-side, no Python). Search ladder:

- :func:`cosine_top_k` — exact brute force (query-set broadcast × full
  scan); the baseline and the verifier.
- :func:`lsh_cosine_top_k` — random-hyperplane LSH bucketing: each
  vector hashes to a ``n_planes``-bit signature; candidates share a
  signature. Approximate, one equi-join instead of a cross join.
- :func:`ivf_top_k` (in ml/ann.py) — KMeans-partitioned IVF index, the
  100 TB path: probe only ``n_probe`` nearest centroids' partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from databeats_spark.operators.windows import top_k_per_group


def _c(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: str | Column, b: str | Column) -> Column:
    """Σ aᵢbᵢ in double precision, left-to-right (oracle-stable order)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: str | Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_top_k(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (small) is broadcast; the corpus is scanned once — at
    cluster scale this is one pass over 100 TB with no shuffle of the
    corpus, only of the (n_queries × k) result via the window.
    Deterministic tie-break on neighbor id.
    Returns (query_id, neighbor_id, cos_sim, rank).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine("__qv", "__cv"))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id")],
        k,
        keep_rank="rank",
    )


def hyperplane_signature(
    vec_col: str | Column,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(v · rᵢ).

    The planes are deterministic literals (seeded NumPy normals) folded
    into the plan — no broadcast variable, no UDF.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    v = _c(vec_col)
    sig = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        d = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
        sig = sig + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def lsh_cosine_top_k(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, then exact
    cosine + window. Recall is tunable via ``n_planes`` (fewer planes →
    bigger buckets → higher recall, more compute). Multi-probe
    (flipping one bit) would raise recall; single-probe keeps the demo
    plan minimal."""
    sig = hyperplane_signature(vec_col, dim, n_planes, seed)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), sig.alias("__bucket")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), sig.alias("__qbucket")
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("__bucket") == F.col("__qbucket")) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("cos_sim", cosine("__qv", "__cv"))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id")],
        k,
        keep_rank="rank",
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH bucketing: pairs sharing
    a hyperplane bucket with cosine ≥ threshold. (id_a < id_b)."""
    sig = hyperplane_signature(vec_col, _infer_dim(embeddings, vec_col), n_planes, seed)
    e = embeddings.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), sig.alias("__bucket"))
    return (
        e.alias("a")
        .join(
            e.alias("b"),
            (F.col("a.__bucket") == F.col("b.__bucket")) & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cosine(F.col("a.__v"), F.col("b.__v")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"])

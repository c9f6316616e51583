"""Lexical retrieval + hybrid fusion over the documents corpus — the
search rung the training-data stack uses for lexical decontamination,
hard-negative mining and eval-leak hunts (beside the dense tier that
cosine_topk / IVF already provide).

- ``bm25_topk`` — Okapi BM25 (Lucene's idf variant) for a fixed
  query-term set. The whole query is shuffle-free except the final
  top-k: per-doc tf/dl come straight off the token array (no explode,
  no groupBy), corpus stats (N, Σdl, df per term) ride ONE keyless
  aggregate over the raw scan (≤1-row side, lint-provable; re-scanning
  beats materializing per the derived-scalar rule since nothing
  upstream shuffles), and the ranking is orderBy+limit —
  TakeOrderedAndProject, not a global window. At 100 TB this is one
  corpus pass + a k-row result per query.
- ``rrf_hybrid_topk`` — reciprocal-rank fusion (Cormack et al.,
  SIGIR'09) of the BM25 top-100 with the dense cosine top-100 for a
  query embedding: score = Σ 1/(K + rank_s). Fusing RETRIEVED LISTS
  (bounded pools), never whole rankings — the only join is a full
  outer over two ≤100-row sides.

Oracle parity is the usual recipe: every score input is exact BIGINT
(tf, dl, df, ranks), double expressions are written with one fixed
parenthesization mirrored verbatim in the DuckDB SQL (ln/÷/× on
identical IEEE inputs are bit-equal), round(…, 6) on output, total-
order tie-breaks on doc_id. The tokenizer is the corpus-wide
whitespace split every text query shares (documents.py tf_idf_terms).

Reference parity: the reference has no search tier; this extends the
same corpus-mining north star as the dedup/ANN tiers (SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databeats_spark.registry import QuerySpec
from databeats_spark.sources.tables import load_tables

BM25_TERMS = ("hash", "join", "spark", "vector")  # fixed lexical query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20
RRF_POOL = 100  # fuse the top-100 retrieved list from each system
RRF_K = 60  # the standard RRF damping constant
RRF_TOP = 20
RRF_QUERY_VEC = 0  # dense query = corpus vector 0 (self excluded)


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All docs matching ≥1 query term, BM25-scored (unranked)."""
    t = load_tables(spark, sf_dir, ["documents"])
    toks = t.documents.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    def tf_col(term: str):
        # one-arg lambda: a defaulted second param would make PySpark
        # treat this as an (element, index) HOF lambda
        return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term)))

    feat = toks.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[
            tf_col(term).cast("bigint").alias(f"tf_{i}")
            for i, term in enumerate(BM25_TERMS)
        ],
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size("toks").cast("bigint")).cast("bigint").alias("sum_dl"),
        *[
            F.sum(F.array_contains("toks", term).cast("bigint"))
            .cast("bigint")
            .alias(f"df_{i}")
            for i, term in enumerate(BM25_TERMS)
        ],
    )
    # ≤1-row side by construction (keyless aggregate) — lint-provable.
    scored = feat.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    dnorm = (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl)
    )
    contribs = []
    for i in range(len(BM25_TERMS)):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        contribs.append(
            idf * (tf * F.lit(BM25_K1 + 1.0)) / (tf + F.lit(BM25_K1) * dnorm)
        )
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c  # fixed left-to-right fold, mirrored in SQL
    n_hits = F.col("tf_0")
    for i in range(1, len(BM25_TERMS)):
        n_hits = n_hits + F.col(f"tf_{i}")
    # graded relevance label for the ranking-quality readout: number of
    # DISTINCT query terms present (1..len(BM25_TERMS)) — pure integer,
    # identical on both engines
    rel = (F.col("tf_0") > 0).cast("int")
    for i in range(1, len(BM25_TERMS)):
        rel = rel + (F.col(f"tf_{i}") > 0).cast("int")
    return scored.select(
        "doc_id",
        "dl",
        n_hits.cast("bigint").alias("n_hits"),
        rel.cast("bigint").alias("rel"),
        score.alias("score"),
    ).filter(F.col("n_hits") > 0)


def _ranked_head(df: DataFrame, order, k: int, rank_name: str) -> DataFrame:
    """Global top-k with a rank column: orderBy+limit first (planned as
    TakeOrderedAndProject), THEN row_number over the ≤k survivors — the
    window's input is behind an explicit LIMIT, so the plan lint proves
    it bounded instead of seeing a global sort."""
    head = df.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return head.withColumn(rank_name, F.row_number().over(w).cast("bigint"))


def _bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _ranked_head(
        _bm25_scored(spark, sf_dir),
        [F.col("score").desc(), F.col("doc_id")],
        BM25_TOP,
        "rank",
    )
    return out.select(
        "doc_id", "dl", "n_hits", F.round("score", 6).alias("score"), "rank"
    ).orderBy("rank")


def _bm25_sql_ctes() -> str:
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    contribs = " + ".join(
        f"(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * {BM25_K1 + 1.0!r})"
        f" / (CAST(tf_{i} AS DOUBLE) + {BM25_K1!r}"
        f" * ({1.0 - BM25_B!r} + {BM25_B!r}"
        f" * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))"
        for i in range(len(BM25_TERMS))
    )
    hits = " + ".join(f"tf_{i}" for i in range(len(BM25_TERMS)))
    rel = " + ".join(
        f"CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END" for i in range(len(BM25_TERMS))
    )
    return f"""toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), feat AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         {tf_cols}
  FROM toks
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(toks)) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM toks
), scored AS (
  SELECT doc_id, dl, CAST({hits} AS BIGINT) AS n_hits,
         CAST({rel} AS BIGINT) AS rel,
         {contribs} AS score
  FROM feat CROSS JOIN stats
  WHERE {hits} > 0
)"""


def _bm25_topk_sql() -> str:
    return f"""
WITH {_bm25_sql_ctes()},
ranked AS (
  SELECT doc_id, dl, n_hits, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT doc_id, dl, n_hits, round(score, 6) AS score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {BM25_TOP}
ORDER BY rank
"""


def _rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databeats_spark.functions.similarity import cosine_top_k

    lex = _ranked_head(
        _bm25_scored(spark, sf_dir),
        [F.col("score").desc(), F.col("doc_id")],
        RRF_POOL,
        "lex_rank",
    ).select("doc_id", "lex_rank")

    t = load_tables(spark, sf_dir, ["embeddings"])
    # the trailing .limit(1) is a semantic no-op (vec_id is unique) that
    # lets the lint PROVE the BNLJ side bounded (cosine_topk posture)
    q = t.embeddings.filter(F.col("vec_id") == RRF_QUERY_VEC).limit(1)
    dense = cosine_top_k(t.embeddings, q, k=RRF_POOL).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("bigint").alias("dense_rank"),
    )

    fused = lex.join(dense, "doc_id", "full_outer")
    contrib_lex = F.when(F.col("lex_rank").isNull(), F.lit(0.0)).otherwise(
        F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("lex_rank").cast("double"))
    )
    contrib_dense = F.when(F.col("dense_rank").isNull(), F.lit(0.0)).otherwise(
        F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("dense_rank").cast("double"))
    )
    scored = fused.withColumn("rrf_score", contrib_lex + contrib_dense)
    out = _ranked_head(
        scored,
        [F.col("rrf_score").desc(), F.col("doc_id")],
        RRF_TOP,
        "fused_rank",
    )
    return out.select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        F.round("rrf_score", 6).alias("rrf_score"),
        "fused_rank",
    ).orderBy("fused_rank")


def _rrf_hybrid_topk_sql() -> str:
    return f"""
WITH {_bm25_sql_ctes()},
lex AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
  FROM scored
  QUALIFY lex_rank <= {RRF_POOL}
), q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = {RRF_QUERY_VEC}
), dense_scored AS (
  SELECT e.vec_id AS doc_id,
         list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cs
  FROM q JOIN embeddings e ON e.vec_id <> {RRF_QUERY_VEC}
), dense AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY cs DESC, doc_id) AS BIGINT) AS dense_rank
  FROM dense_scored
  QUALIFY dense_rank <= {RRF_POOL}
), fused AS (
  SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id, lex.lex_rank, dense.dense_rank,
         (CASE WHEN lex.lex_rank IS NULL THEN 0.0
               ELSE 1.0 / ({float(RRF_K)!r} + CAST(lex.lex_rank AS DOUBLE)) END
          + CASE WHEN dense.dense_rank IS NULL THEN 0.0
                 ELSE 1.0 / ({float(RRF_K)!r} + CAST(dense.dense_rank AS DOUBLE)) END) AS rrf_score
  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
), final AS (
  SELECT doc_id, lex_rank, dense_rank, rrf_score,
         CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS fused_rank
  FROM fused
)
SELECT doc_id, lex_rank, dense_rank, round(rrf_score, 6) AS rrf_score, fused_rank
FROM final WHERE fused_rank <= {RRF_TOP}
ORDER BY fused_rank
"""


# --- Q: bm25_ranking_quality — NDCG@k / MRR / P@k / R@k readout ------
# The eval rung on top of the retrieval tier: grade the BM25 ranking
# against a deterministic graded label (rel = DISTINCT query terms
# present, 1..4 — pure integer, both engines identical). All list
# arithmetic is bounded: the ranked head and the ideal head are each
# behind an explicit LIMIT k (TakeOrderedAndProject, lint-provable),
# the corpus relevant-count is ONE keyless aggregate, and the final
# row is a crossJoin of three ≤1-row sides. DCG/IDCG are ordered
# left folds over the ≤k-row lists (F.aggregate from 0.0, mirrored by
# DuckDB's 0.0-prepended list_reduce — the JS-drift recipe), with one
# fixed parenthesization of the gain term on both engines. At 100 TB
# this is the bm25 corpus pass + two k-row folds — eval is free.
NDCG_K = 20
REL_POS = 2  # binary-relevant for precision/recall: >= 2 distinct terms
REL_GOOD = 3  # MRR target grade: >= 3 distinct terms


def _gain(rel_col, rank_col):
    """(2^rel - 1) / log2(rank + 1), one fixed parenthesization."""
    return (F.pow(F.lit(2.0), rel_col.cast("double")) - F.lit(1.0)) / (
        F.log(rank_col.cast("double") + F.lit(1.0)) / F.log(F.lit(2.0))
    )


def _ordered_dcg(df: DataFrame, rank_col: str) -> F.Column:
    """Ordered DCG fold over a bounded ranked head: collect the ≤k
    (rank, rel) structs, sort by rank, left-fold the gains from 0.0."""
    arr = F.array_sort(F.collect_list(F.struct(F.col(rank_col).alias("r"), F.col("rel"))))
    gains = F.transform(arr, lambda s: _gain(s["rel"], s["r"]))
    return F.aggregate(gains, F.lit(0.0), lambda a, x: a + x)


def _bm25_ranking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scored(spark, sf_dir)
    ranked = _ranked_head(
        scored, [F.col("score").desc(), F.col("doc_id")], NDCG_K, "rank"
    )
    ideal = _ranked_head(
        scored, [F.col("rel").desc(), F.col("doc_id")], NDCG_K, "irank"
    )
    dcg_row = ranked.agg(
        _ordered_dcg(ranked, "rank").alias("dcg"),
        F.min(F.when(F.col("rel") >= REL_GOOD, F.col("rank"))).alias("mrr_rank"),
        F.sum((F.col("rel") >= REL_POS).cast("bigint")).alias("hits_at_k"),
    )
    idcg_row = ideal.agg(_ordered_dcg(ideal, "irank").alias("idcg"))
    total_row = scored.agg(
        F.sum((F.col("rel") >= REL_POS).cast("bigint")).alias("n_relevant")
    )
    out = dcg_row.crossJoin(idcg_row).crossJoin(total_row)
    mrr = F.coalesce(
        F.lit(1.0) / F.col("mrr_rank").cast("double"), F.lit(0.0)
    )
    return out.select(
        F.lit(NDCG_K).cast("bigint").alias("k"),
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_k"),
        F.round(mrr, 6).alias("mrr"),
        F.round(
            F.col("hits_at_k").cast("double") / F.lit(float(NDCG_K)), 6
        ).alias("precision_at_k"),
        F.round(
            F.col("hits_at_k").cast("double") / F.col("n_relevant").cast("double"), 6
        ).alias("recall_at_k"),
        "n_relevant",
    )


def _bm25_ranking_quality_sql() -> str:
    gain_r = (
        "(pow(2.0, CAST(rel AS DOUBLE)) - 1.0)"
        " / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0))"
    )
    gain_i = (
        "(pow(2.0, CAST(rel AS DOUBLE)) - 1.0)"
        " / (ln(CAST(irank AS DOUBLE) + 1.0) / ln(2.0))"
    )
    return f"""
WITH {_bm25_sql_ctes()},
ranked AS (
  SELECT doc_id, rel,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
  FROM scored QUALIFY rank <= {NDCG_K}
), ideal AS (
  SELECT rel,
         CAST(row_number() OVER (ORDER BY rel DESC, doc_id) AS BIGINT) AS irank
  FROM scored QUALIFY irank <= {NDCG_K}
), dcg_row AS (
  SELECT list_reduce(list_prepend(0.0, list({gain_r} ORDER BY rank)),
                     (a, b) -> a + b) AS dcg,
         min(CASE WHEN rel >= {REL_GOOD} THEN rank END) AS mrr_rank,
         CAST(sum(CASE WHEN rel >= {REL_POS} THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_k
  FROM ranked
), idcg_row AS (
  SELECT list_reduce(list_prepend(0.0, list({gain_i} ORDER BY irank)),
                     (a, b) -> a + b) AS idcg
  FROM ideal
), total_row AS (
  SELECT CAST(sum(CASE WHEN rel >= {REL_POS} THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant
  FROM scored
)
SELECT CAST({NDCG_K} AS BIGINT) AS k,
       round(dcg, 6) AS dcg,
       round(idcg, 6) AS idcg,
       round(dcg / idcg, 6) AS ndcg_at_k,
       round(COALESCE(1.0 / CAST(mrr_rank AS DOUBLE), 0.0), 6) AS mrr,
       round(CAST(hits_at_k AS DOUBLE) / {float(NDCG_K)!r}, 6) AS precision_at_k,
       round(CAST(hits_at_k AS DOUBLE) / CAST(n_relevant AS DOUBLE), 6) AS recall_at_k,
       n_relevant
FROM dcg_row CROSS JOIN idcg_row CROSS JOIN total_row
"""


SPECS = [
    QuerySpec(
        "bm25_topk",
        "Okapi BM25 lexical retrieval: shuffle-free scoring off the token array, one keyless corpus-stats aggregate, TakeOrderedAndProject top-k",
        _bm25_topk,
        _bm25_topk_sql,
        tags=("text", "retrieval"),
    ),
    QuerySpec(
        "rrf_hybrid_topk",
        "hybrid retrieval: reciprocal-rank fusion of the BM25 top-100 with the dense cosine top-100 (bounded pools, one full-outer join)",
        _rrf_hybrid_topk,
        _rrf_hybrid_topk_sql,
        tags=("text", "retrieval", "vectors"),
    ),
    QuerySpec(
        "bm25_ranking_quality",
        "retrieval eval readout: NDCG@k / MRR / precision@k / recall@k of the BM25 ranking vs the distinct-terms graded label (bounded k-row ordered folds)",
        _bm25_ranking_quality,
        _bm25_ranking_quality_sql,
        tags=("retrieval", "eval"),
    ),
]

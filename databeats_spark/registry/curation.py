"""Training-data curation operators (round-2 batch) — the quality /
mix-shaping signals a 100 TB pretraining pipeline computes over the
documents table, beyond the dedup and sampling families already in
``registry/documents.py``:

- rare_trigram_stats: character-trigram rarity scoring — the
  UDF-free stand-in for n-gram-LM quality filtering (docs dominated by
  corpus-rare trigrams are noise/garble candidates). The trigram
  document-frequency table is bounded by charset³, so it broadcasts at
  any corpus scale (same scaling argument as benchmark_decontam).
- length_band_outliers: per-language rank-based p5/p95 length band.
  Computed from a (lang, n_chars) histogram so the per-language window
  runs over distinct lengths, not documents — the per-group-window
  funnel a naive rank would create at 100 TB never materializes.
- per_source_quota: deterministic at-most-K-docs-per-source cap
  (domain caps in web-crawl curation) keyed by md5(doc_id) so the kept
  subset is engine- and partitioning-independent. Spark's
  WindowGroupLimit rewrite turns the rank filter into a map-side
  partial top-K, so no source's full document list is ever sorted in
  one task.

Oracle parity follows the registry recipe (BIGINT counts, round(…,6)
ratio doubles, total-order ties); the trigram normalization reuses the
Java/RE2-identical regex subset established by dedup_exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databeats_spark.operators.windows import top_k_per_group
from databeats_spark.registry import QuerySpec
from databeats_spark.sources.tables import load_tables


# --- Q: rare_trigram_stats -------------------------------------------
# Per-document: distinct char-trigram count, count of corpus-rare
# trigrams (document frequency below 0.5% of the corpus — the
# cross-multiplied, scale-invariant form df*200 < n_docs), and the
# rare fraction. Docs shorter than one trigram drop out of the inner
# join on both engines identically.

def _rare_trigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    pairs = (
        t.documents.select("doc_id", norm.alias("norm"))
        .filter(F.length("norm") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr("transform(sequence(1, length(norm) - 2), i -> substring(norm, i, 3))")
                )
            ).alias("tri"),
        )
    )
    dfreq = pairs.groupBy("tri").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = t.documents.agg(F.count(F.lit(1)).alias("n_docs"))
    rare = F.when(F.col("df_docs") * 200 < F.col("n_docs"), F.lit(1)).otherwise(F.lit(0))
    return (
        pairs.join(F.broadcast(dfreq), "tri")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.sum(rare).cast("long").alias("n_rare"),
            F.round(F.sum(rare).cast("double") / F.count(F.lit(1)), 6).alias("rare_ratio"),
        )
        .orderBy("doc_id")
    )


_RARE_TRIGRAM_STATS_SQL = """
WITH norm AS (
  SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
  FROM documents
),
pairs AS (
  SELECT DISTINCT doc_id, substring(norm, CAST(i AS INTEGER), 3) AS tri
  FROM norm, unnest(range(1, greatest(length(norm) - 1, 1))) AS u(i)
),
dfreq AS (
  SELECT tri, CAST(count(*) AS BIGINT) AS df_docs FROM pairs GROUP BY tri
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_tri,
       CAST(sum(CASE WHEN d.df_docs * 200 < nd.n_docs THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       round(CAST(sum(CASE WHEN d.df_docs * 200 < nd.n_docs THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS rare_ratio
FROM pairs p
JOIN dfreq d USING (tri), nd
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


# --- Q: length_band_outliers -----------------------------------------
# Documents outside their language's [p5, p95] character-length band.
# The percentile is rank-based (value at index ((n-1)*p)//100 of the
# sorted lengths — pure integer arithmetic, no interpolation, so both
# engines pick the identical element). The Spark side derives it from
# the compact (lang, n_chars) histogram: the per-language window scans
# distinct lengths only, so corpus growth widens the histogram slowly
# (distinct lengths, not documents) and no 100 TB-scale window exists.
# The oracle spells the naive per-document rank — same value, since
# rank ties share the length value.

def _length_band_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t.documents.select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))
    hist = docs.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy("lang").orderBy("n_chars")
    w_all = Window.partitionBy("lang")
    cum = (
        hist.withColumn("cum_end", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(w_all))
        .withColumn("lo_idx", F.expr("((n - 1) * 5) div 100"))
        .withColumn("hi_idx", F.expr("((n - 1) * 95) div 100"))
    )
    covers = lambda idx: (F.col("cum_end") - F.col("cnt") <= F.col(idx)) & (
        F.col(idx) < F.col("cum_end")
    )
    band = cum.groupBy("lang").agg(
        F.max(F.when(covers("lo_idx"), F.col("n_chars"))).alias("lo_val"),
        F.max(F.when(covers("hi_idx"), F.col("n_chars"))).alias("hi_val"),
    )
    return (
        docs.join(F.broadcast(band), "lang")
        .filter((F.col("n_chars") < F.col("lo_val")) | (F.col("n_chars") > F.col("hi_val")))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            (F.col("n_chars") < F.col("lo_val")).alias("is_short"),
            (F.col("n_chars") > F.col("hi_val")).alias("is_long"),
        )
        .orderBy("lang", "doc_id")
    )


_LENGTH_BAND_OUTLIERS_SQL = """
WITH r AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) - 1 AS rn,
         CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
  FROM documents
),
band AS (
  SELECT lang,
         max(CASE WHEN rn = ((n - 1) * 5) // 100 THEN n_chars END) AS lo_val,
         max(CASE WHEN rn = ((n - 1) * 95) // 100 THEN n_chars END) AS hi_val
  FROM r GROUP BY lang
)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
       d.n_chars < b.lo_val AS is_short,
       d.n_chars > b.hi_val AS is_long
FROM documents d
JOIN band b USING (lang)
WHERE d.n_chars < b.lo_val OR d.n_chars > b.hi_val
ORDER BY d.lang, d.doc_id
"""


# --- Q: per_source_quota ---------------------------------------------
# At most K documents per source, chosen by md5(doc_id) order — the
# deterministic domain-cap: reproducible across engines, partitionings
# and runs (the same auditability argument as deterministic_sample).
# The rank filter compiles to Spark's WindowGroupLimit (map-side
# partial top-K per source before the shuffle), so a source with a
# billion documents ships only K candidates per input partition.

SOURCE_QUOTA_K = 15


def _per_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    key = F.md5(F.col("doc_id").cast("string"))
    kept = top_k_per_group(
        t.documents.select("doc_id", "source", key.alias("hash_key")),
        ["source"],
        ["hash_key", "doc_id"],
        SOURCE_QUOTA_K,
        keep_rank="quota_rank",
    )
    return (
        kept.select(
            "doc_id", "source", F.col("quota_rank").cast("long").alias("quota_rank")
        )
        .orderBy("source", "quota_rank")
    )


_PER_SOURCE_QUOTA_SQL = f"""
SELECT doc_id, source, CAST(quota_rank AS BIGINT) AS quota_rank
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS quota_rank
  FROM documents
)
WHERE quota_rank <= {SOURCE_QUOTA_K}
ORDER BY source, quota_rank
"""


SPECS = [
    QuerySpec("rare_trigram_stats", "char-trigram rarity scoring (n-gram-LM quality proxy)", _rare_trigram_stats, _RARE_TRIGRAM_STATS_SQL, tags=("text", "quality")),
    QuerySpec("length_band_outliers", "per-language rank-based p5/p95 length band outliers", _length_band_outliers, _LENGTH_BAND_OUTLIERS_SQL, tags=("text", "quality")),
    QuerySpec("per_source_quota", "deterministic at-most-K-per-source domain cap", _per_source_quota, _PER_SOURCE_QUOTA_SQL, tags=("text", "sampling")),
]

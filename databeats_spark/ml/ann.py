"""IVF approximate-nearest-neighbor index — the 100 TB similarity path.

Brute-force cosine (functions/similarity.py) scans the whole corpus
per query batch. An IVF (inverted-file) index partitions the corpus by
KMeans centroid; queries probe only the ``n_probe`` nearest centroids'
partitions — at cluster scale, with the corpus written partitioned by
``centroid_id``, that is partition pruning: the scan itself skips
(n_lists - n_probe)/n_lists of the data.

Fit is Spark ML KMeans (distributed, seeded); assignment + probing are
pure DataFrame ops; the final exact re-rank reuses the zip_with cosine.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, functions as F

from databeats_spark.functions.similarity import cosine
from databeats_spark.operators.windows import top_k_per_group


class IVFIndex:
    def __init__(self, kmeans: KMeansModel, assigned: DataFrame, id_col: str, vec_col: str):
        self.kmeans = kmeans
        self.assigned = assigned  # corpus + centroid_id
        self.id_col = id_col
        self.vec_col = vec_col

    @classmethod
    def fit(
        cls,
        embeddings: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_lists: int = 16,
        seed: int = 42,
        max_iter: int = 20,
        init_mode: str = "k-means||",
    ) -> "IVFIndex":
        # KMeans is compute-bound: a single-file parquet scan arrives as
        # one partition and serializes the fit — spread() no-ops when the
        # scan already has parallelism (the real-scale case)
        from databeats_spark.sources.tables import spread

        vecs = spread(
            embeddings.withColumn("__v", array_to_vector(F.col(vec_col))),
            embeddings.sparkSession,
        )
        km = KMeans(
            k=n_lists, seed=seed, maxIter=max_iter, initMode=init_mode,
            featuresCol="__v", predictionCol="centroid_id",
        ).fit(vecs)
        assigned = km.transform(vecs).select(id_col, vec_col, "centroid_id")
        return cls(km, assigned, id_col, vec_col)

    def add(self, new_vectors: DataFrame) -> "IVFIndex":
        """Incremental maintenance: assign a new ingest batch to its
        nearest EXISTING centroids (the same KMeans transform the fit
        used — one narrow pass over the batch, no shuffle of the
        existing corpus) and union it into the index. At 100 TB a full
        recluster per ingest batch is a non-starter; the documented
        trade-off is recall drift when new data forms regions the old
        centroids don't cover — measure it with
        :meth:`mean_assignment_distance` and refit when the batch's
        distance runs away from the fit-time baseline."""
        vecs = new_vectors.withColumn("__v", array_to_vector(F.col(self.vec_col)))
        assigned = self.kmeans.transform(vecs).select(
            self.id_col, self.vec_col, "centroid_id"
        )
        return IVFIndex(
            self.kmeans, self.assigned.unionByName(assigned), self.id_col, self.vec_col
        )

    def mean_assignment_distance(self, vectors: DataFrame) -> float:
        """Mean Euclidean distance of ``vectors`` to their nearest
        centroid — the refit trigger: compare an ingest batch against
        the corpus baseline; a runaway batch means the centroid book
        no longer covers the data. One assignment pass + one scalar
        aggregate (bounded driver read)."""
        centers = [
            (ci, [float(x) for x in c]) for ci, c in enumerate(self.kmeans.clusterCenters())
        ]
        spark = vectors.sparkSession
        cdf = spark.createDataFrame(centers, ["centroid_id", "center"]).limit(len(centers))
        vecs = self.kmeans.transform(
            vectors.withColumn("__v", array_to_vector(F.col(self.vec_col)))
        ).select(F.col(self.vec_col).alias("__av"), "centroid_id")
        dist2 = F.aggregate(
            F.zip_with(F.col("__av"), F.col("center"), lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        row = (
            vecs.join(F.broadcast(cdf), "centroid_id")
            .agg(F.avg(F.sqrt(dist2)).alias("d"))
            .collect()[0]
        )
        return float(row["d"] or 0.0)

    def write_partitioned(self, path: str) -> None:
        """Persist the corpus partitioned by centroid — probing then
        becomes parquet partition pruning on read."""
        self.assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)

    def save(self, path: str) -> None:
        """Full index persistence: the fitted KMeans model (centroids)
        beside the centroid-partitioned corpus, plus a metadata JSON
        recording the fit-time column names — so an index fit through a
        non-default path (e.g. encode_payloads with id_col='doc_id')
        reopens without the caller remembering them (reference K5's
        model-dump shape, applied to the index)."""
        self.kmeans.write().overwrite().save(f"{path}/kmeans")
        self.write_partitioned(f"{path}/corpus")
        meta = {
            "id_col": self.id_col,
            "vec_col": self.vec_col,
            "n_lists": len(self.kmeans.clusterCenters()),
        }
        spark = self.assigned.sparkSession
        # write the 1-row metadata through the same FS abstraction as
        # the model (works on any Hadoop-supported store, not just
        # local disk)
        spark.createDataFrame([meta]).coalesce(1).write.mode("overwrite").json(
            f"{path}/meta"
        )

    @classmethod
    def load(
        cls, spark, path: str, id_col: str | None = None, vec_col: str | None = None
    ) -> "IVFIndex":
        """Reopen a saved index. Column names come from the metadata
        JSON written by :meth:`save` (explicit arguments override, and
        remain the fallback for pre-metadata artifacts). The corpus scan
        stays lazy and centroid-partitioned, so probe-time partition
        pruning survives the roundtrip (test_partition_pruning
        posture)."""
        from pyspark.errors import AnalysisException

        # Presence is a FILESYSTEM question, not a read question: a
        # partially-written meta/ (crashed save, _SUCCESS only) makes
        # spark.read.json raise the same AnalysisException as a missing
        # dir, which would silently conflate "broken artifact" with
        # "pre-metadata artifact". Ask the Hadoop FS directly (works on
        # any supported store, same abstraction save() writes through).
        meta_dir = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/meta")
        fs = meta_dir.getFileSystem(spark._jsc.hadoopConfiguration())
        meta_present = fs.exists(meta_dir)
        meta_rows = []
        if meta_present:
            try:
                meta_rows = spark.read.json(f"{path}/meta").collect()
            except AnalysisException:
                meta_rows = []  # present-but-unreadable → raise below
        meta = meta_rows[0].asDict() if meta_rows else {}
        id_col = id_col or meta.get("id_col")
        vec_col = vec_col or meta.get("vec_col")
        if not (id_col and vec_col):
            if meta_present:
                # a meta/ dir that exists but yields no parseable rows
                # (partially-written artifact, _SUCCESS only) or rows
                # missing fields is a BROKEN artifact, not a
                # pre-metadata one — defaulting here would silently
                # reopen with the wrong columns (explicit caller
                # arguments still override a broken meta). ADVICE r7.
                raise ValueError(
                    f"unreadable IVF index metadata at {path}/meta: {meta}"
                )
            id_col = id_col or "vec_id"
            vec_col = vec_col or "embedding"
        km = KMeansModel.load(f"{path}/kmeans")
        assigned = spark.read.parquet(f"{path}/corpus").select(
            id_col, vec_col, "centroid_id"
        )
        return cls(km, assigned, id_col, vec_col)

    def _query_centroids(self, queries: DataFrame, n_probe: int) -> DataFrame:
        """Top n_probe centroids per query by Euclidean distance,
        computed as array arithmetic against the centroid literals."""
        centers = self.kmeans.clusterCenters()
        rows = []
        for ci, c in enumerate(centers):
            rows.append((ci, [float(x) for x in c]))
        spark = queries.sparkSession
        # .limit(n_lists) is a semantic no-op on the literal centroid
        # table (Python createDataFrame plans as an RDD scan, which a
        # plan lint cannot prove bounded) — it makes the broadcast
        # side's bound explicit in the plan itself
        cdf = spark.createDataFrame(rows, ["centroid_id", "center"]).limit(len(rows))
        q = queries.select(
            F.col(self.id_col).alias("query_id"), F.col(self.vec_col).alias("__qv")
        )
        dist2 = F.aggregate(
            F.zip_with(F.col("__qv"), F.col("center"), lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scored = q.join(F.broadcast(cdf)).withColumn("__d2", dist2)
        return top_k_per_group(
            scored.select("query_id", "__qv", "centroid_id", "__d2"),
            ["query_id"],
            [F.col("__d2").asc(), F.col("centroid_id")],
            n_probe,
        ).select("query_id", "__qv", "centroid_id")

    def search(self, queries: DataFrame, k: int = 10, n_probe: int = 4) -> DataFrame:
        """Approximate top-k cosine: probe n_probe lists, exact re-rank
        inside them. Returns (query_id, neighbor_id, cos_sim, rank)."""
        probes = self._query_centroids(queries, n_probe)
        cand = self.assigned.select(
            F.col(self.id_col).alias("neighbor_id"), F.col(self.vec_col).alias("__cv"), "centroid_id"
        )
        scored = (
            cand.join(F.broadcast(probes), "centroid_id")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("cos_sim", cosine("__qv", "__cv"))
            .select("query_id", "neighbor_id", "cos_sim")
        )
        return top_k_per_group(
            scored, ["query_id"], [F.col("cos_sim").desc(), F.col("neighbor_id")], k, keep_rank="rank"
        )

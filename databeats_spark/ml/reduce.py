"""PCA dimensionality reduction for the embedding/ANN surface.

At 100 TB the embedding column IS the data volume: 768 float32 dims
are 3 KB/row, and every ANN stage (IVF fit, probe shuffle, brute-force
verify) moves that payload. Projecting to the top-k principal
components before indexing cuts the moved bytes by dim_out/dim_in
(e.g. 64→16 = 4×) while keeping most of the variance — the standard
production recipe (OPQ/PCA front of FAISS-style pipelines).

Spark shape: MLlib ``PCA`` is one distributed Gramian pass (outer
products tree-aggregated to the driver, eigen-decomposition on the
k×k driver-side matrix) — the corpus is scanned once and never
shuffled. The projection itself is a JVM matrix-vector multiply per
row inside the fitted model's ``transform``; everything stays
Arrow-free and codegen-adjacent (no Python in the row path).

The reducer emits the SAME (id, array<float/double>) shape the rest of
the ladder consumes, so reduced vectors feed
``functions.similarity.cosine_top_k`` and ``ml.ann.IVFIndex.fit``
unchanged.

Reference parity: the reference's ML surface has no PCA; this extends
the similarity-search north star (SURVEY §7 #8) the same way the IVF
tier does.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.feature import PCA, PCAModel
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PCAReducer:
    """Fitted PCA projection for array-typed embedding columns."""

    model: PCAModel
    vec_col: str

    @classmethod
    def fit(cls, embeddings: DataFrame, vec_col: str = "embedding", k: int = 16) -> "PCAReducer":
        from databeats_spark.sources.tables import spread

        vecs = spread(
            embeddings.select(array_to_vector(F.col(vec_col)).alias("__v")),
            embeddings.sparkSession,
        )
        model = PCA(k=k, inputCol="__v", outputCol="__p").fit(vecs)
        return cls(model=model, vec_col=vec_col)

    @property
    def k(self) -> int:
        return self.model.getK()

    def explained_variance(self) -> list[float]:
        """Per-component explained-variance ratios (descending)."""
        return list(self.model.explainedVariance)

    def transform(self, df: DataFrame, out_col: str | None = None) -> DataFrame:
        """Replace (or add) the embedding column with its projection.

        Output is array<double> in the same row shape, so downstream
        cosine/IVF operators take it as a drop-in ``vec_col``.
        """
        out = out_col or self.vec_col
        projected = self.model.transform(
            df.withColumn("__v", array_to_vector(F.col(self.vec_col)))
        )
        return projected.withColumn(out, vector_to_array(F.col("__p"))).drop("__v", "__p")

"""databeats_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference system (putridar/DataBEATS, surveyed in SURVEY.md),
re-expressed Spark-first: declarative DataFrame/SQL logical plans,
Catalyst/Tungsten physical execution, Spark ML pipelines, and
Structured Streaming — plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
columns) the reference never had.

Layout:
    session.py    SparkSession factory with scale-ready defaults
    schemas.py    explicit StructTypes for the reference data model
    sources/      table loaders + external-ingestion connectors
    operators/    relational operators (windows, dedup, joins)
    functions/    scalar/column function library (text, time, similarity)
    plans/        end-to-end pipelines (ETL, analytics/dashboard)
    ml/           Spark ML pipelines (regression, recommender)
    streaming/    Structured Streaming variants
    registry.py   the query inventory wired to the driver contract
"""

__version__ = "0.1.0"

from databeats_spark.session import get_spark  # noqa: F401

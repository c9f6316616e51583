"""File-format sources beyond parquet — reference S8 (CSV / pickle
loads in the notebooks) and the external-store equivalents (S6/S7).

The reference persists intermediates as CSV and joblib pickles
(ETL_Experiment.ipynb cell-2, Recommendation_model.ipynb cell-2) and
scans MongoDB/BigQuery with SELECT * (dag.py:369-377, app.py:11-33).
Here: schema-explicit readers (inference disabled — schema drift fails
loudly, SURVEY §1 "schema-by-example" hazard), and the external stores
become parquet-backed tables behind the same call sites — swapping in
``spark.read.format("mongodb")`` / the BigQuery connector is a one-line
change where those jars exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    """CSV with an explicit schema — never inferSchema in a pipeline
    (a second pass over the data AND nondeterministic typing)."""
    return spark.read.csv(path, header=header, schema=schema, mode="FAILFAST")


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_history_table(spark: SparkSession, path: str) -> DataFrame:
    """The raw-history store (Mongo role, reference S6): append-mode
    week-partitioned parquet written by plans/etl.write_history."""
    return spark.read.parquet(path)


def read_snapshot_table(spark: SparkSession, path: str) -> DataFrame:
    """The curated-snapshot store (BigQuery role, reference S7)."""
    return spark.read.parquet(path)

from databeats_spark.plans import analytics, etl  # noqa: F401

from databeats_spark.functions import text, timeutils, similarity  # noqa: F401

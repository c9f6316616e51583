from databeats_spark.sources.tables import TESTDATA_TABLES, load_tables, register_views  # noqa: F401

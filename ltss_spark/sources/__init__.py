from ltss_spark.sources.batch import TABLES, load_table, write_partitioned  # noqa: F401

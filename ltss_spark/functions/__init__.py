from ltss_spark.functions.numeric import davg, dsum  # noqa: F401

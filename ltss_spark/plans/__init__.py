"""Query-plan registry. Importing this package registers every operator
(core relational, ltss parity, time-series, extensions) into REGISTRY."""

from ltss_spark.plans.registry import REGISTRY, oracle_sql, queries  # noqa: F401
import ltss_spark.plans.registry_agg  # noqa: F401,E402
import ltss_spark.plans.registry_ltss  # noqa: F401,E402
import ltss_spark.plans.registry_ext  # noqa: F401,E402
import ltss_spark.plans.registry_stream  # noqa: F401,E402
import ltss_spark.plans.registry_udf  # noqa: F401,E402
import ltss_spark.plans.registry_sql  # noqa: F401,E402

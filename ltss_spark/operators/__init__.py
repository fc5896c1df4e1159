from ltss_spark.operators.asof import asof_join  # noqa: F401
from ltss_spark.operators.gapfill import time_bucket_gapfill  # noqa: F401
from ltss_spark.operators.timeseries import (  # noqa: F401
    entity_range_scan,
    latest_state,
    time_bucket_agg,
    time_in_state,
)

"""ltss_spark — a PySpark-native analytics engine with the capabilities of
freol35241/ltss (Long Time State Storage), rebuilt Spark-first.

The reference (/root/reference) is a streaming ingest component that stores
Home Assistant state-change events in a TimescaleDB hypertable and delegates
ALL querying to PostgreSQL (see SURVEY.md). This package therefore owns both
halves natively in Spark:

- ingest dataflow (filter -> project -> sanitize -> geo-extract -> sink):
  :mod:`ltss_spark.ingest` (batch) and :mod:`ltss_spark.streaming` (Structured
  Streaming), mirroring custom_components/ltss/__init__.py:246-255 and
  models.py:46-72;
- the query surface the reference outsources to PostgreSQL/TimescaleDB/
  PostGIS: :mod:`ltss_spark.operators` (relational core, as-of join,
  gap-fill, time buckets, geo) — expressed as DataFrame compositions that
  Catalyst optimizes (partition pruning replaces hypertable chunk exclusion,
  parquet min/max stats replace the btree indexes);
- the LLM-data-pipeline extensions mandated for 100 TB scale: dedup (exact /
  MinHash-LSH / n-gram Jaccard), similarity search, text analysis, multimodal
  column plumbing.

Everything here is public-knowledge PySpark; no custom JVM code.
"""

__version__ = "0.1.0"

from ltss_spark.config import LtssConfig, load_yaml_config, parse_config  # noqa: F401
from ltss_spark.session import get_spark  # noqa: F401

"""Registry part 6: the UDF/UDAF/UDTF surface (SURVEY.md §2.C udf_scalar,
udaf, udtf) — each extension point exercised in its Arrow-vectorized form
and hash-checked against a pure-SQL DuckDB oracle."""

from __future__ import annotations

from ltss_spark.plans.registry import _t, register


@register(
    "udf_scalar",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+'))
                AS INT) AS n_bpe_tokens
    FROM documents
    """,
    survey="udf_scalar (Arrow pandas_udf, BPE-ish token count)",
)
def udf_scalar(spark, sf_dir):
    from ltss_spark.functions.udfs import doc_token_counts

    return doc_token_counts(_t(spark, sf_dir, "documents"))


@register(
    "udaf",
    """
    SELECT event_type,
           COUNT(*) AS n,
           round(median(value), 6) AS median_value,
           CAST(SUM(event_id) AS BIGINT) AS id_checksum
    FROM events
    GROUP BY event_type
    """,
    survey="udaf (applyInPandas grouped-map exact median)",
)
def udaf(spark, sf_dir):
    from ltss_spark.functions.udfs import grouped_median

    return grouped_median(_t(spark, sf_dir, "events"))


@register(
    "udtf",
    """
    WITH parts AS (
      SELECT doc_id, string_split(text, '. ') AS p FROM documents
    )
    SELECT doc_id, CAST(g.i - 1 AS INT) AS idx, p[g.i] AS sentence
    FROM parts, UNNEST(generate_series(1, len(p))) AS g(i)
    """,
    survey="udtf (Python UDTF sentence split, LATERAL join)",
)
def udtf_q(spark, sf_dir):
    from ltss_spark.functions.udfs import doc_sentences

    return doc_sentences(_t(spark, sf_dir, "documents"))

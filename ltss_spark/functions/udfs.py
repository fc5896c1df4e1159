"""The UDF/UDAF/UDTF surface (SURVEY.md §2.C udf_scalar / udaf / udtf).

The reference's only user-defined code is the row-projection
``LTSS.from_event`` (/root/reference/custom_components/ltss/models.py:46-72)
and a custom JSON encoder hook (__init__.py:266) — both re-expressed here as
column expressions (ltss_spark.ingest). This module exercises the three
Spark extension points a training-data pipeline actually needs when built-in
expressions run out, each in its fastest form:

- scalar: ``@pandas_udf`` — Arrow-batched, vectorized pandas ops, never
  row-at-a-time Python (10-100x difference in the hot path);
- aggregate: ``applyInPandas`` grouped-map — whole group as one pdf;
- table: ``@udtf`` — one row in, many rows out, joined laterally.

Everything is deterministic and oracle-checkable: regex token rules shared
with RE2, medians on sorted doubles, literal string splits.
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf, udtf

#: BPE-ish token rule: letter runs | single digits | punctuation runs.
#: No lookarounds, so Python `re` and DuckDB's RE2 agree exactly.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


@pandas_udf("int")
def bpe_token_count_udf(texts: pd.Series) -> pd.Series:
    """Vectorized subword-ish token count — the Arrow scalar-UDF path.
    The whole Arrow batch is one pandas str op (C-loop under the hood),
    not a per-row Python call."""
    pat = re.compile(BPE_TOKEN_RE)
    return texts.str.findall(pat).str.len().fillna(0).astype("int32")


def doc_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id", bpe_token_count_udf(F.col(text_col)).alias("n_bpe_tokens")
    )


def grouped_median(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Exact per-group median via ``applyInPandas`` — the grouped-map UDAF
    path: Spark shuffles each group to one worker, hands it over as a single
    Arrow-backed pdf.

    Scale note: exact median requires the whole group on one node — fine
    for bounded-cardinality keys (event types, entity domains); for
    unbounded keys at 100 TB use ``F.percentile_approx`` instead. This
    operator exists to prove the exact-UDAF surface.
    """

    # the checksum column falls back to a NON-NULL COUNT of the value column
    # when the frame has no event_id — summing doubles would raise on NaN
    # and make the truncated 'checksum' sensitive to fp accumulation order,
    # unlike the integral event_id sum it stands in for
    has_event_id = "event_id" in df.columns

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if has_event_id:
            checksum = int(pdf["event_id"].sum())
        else:
            checksum = int(pdf[value_col].notna().sum())
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [len(pdf)],
                "median_value": [round(float(pdf[value_col].median()), 6)],
                "id_checksum": [checksum],
            }
        )

    key_type = dict(df.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, n bigint, median_value double, id_checksum bigint"
    )
    return df.groupBy(key_col).applyInPandas(fn, schema=out_schema)


@udtf(returnType="idx int, sentence string")
class SentenceSplit:
    """Python UDTF: one document in, one row per '. '-separated sentence
    out — the table-function path (explode of a computed, variable-length
    result). Lateral-joined so each input row fans out independently."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            yield (i, s)


def doc_sentences(docs: DataFrame) -> DataFrame:
    """LATERAL-join the UDTF against the documents table."""
    spark = docs.sparkSession
    spark.udtf.register("ltss_sentence_split", SentenceSplit)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.idx, s.sentence
        FROM _udtf_docs d, LATERAL ltss_sentence_split(d.text) s
        """
    )

"""Similarity search over embedding columns (driver-mandated extension,
BASELINE.json north_star; SURVEY.md §2.C ext_sim_search).

Two tiers:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline. The
  dot product is a fold over ``zip_with`` products (JVM higher-order
  functions, no Python); norms are computed once per side. The probe set is
  broadcast, so the big side streams through ONE scan with no shuffle until
  the final per-query top-k (window over |queries| x k rows).
- ``cosine_topk_lsh``: random-hyperplane (sign) LSH bucketing — the 100 TB
  path. Hyperplane values are derived from md5 (deterministic, no RNG state
  on executors); candidates share >= 1 of ``tables`` bucket signatures, so
  comparisons scale with bucket collisions, not |corpus| x |queries|.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _dot(a: Column, b: Column) -> Column:
    """Sequential left fold => deterministic double sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, candidate_id, cosine) with k rows per
    query, self-matches excluded, score rounded to 6 and ties broken by
    candidate_id (determinism for the oracle hash).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("candidate_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("candidate_id") != F.col("query_id"))
        .select(
            "query_id",
            "candidate_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cosine", "rank")
    )


def _hyperplane(table: int, bit: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1], derived
    from md5(table:bit:dim) — reproducible on any engine / cluster size."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{table}:{bit}:{d}".encode()).hexdigest()
        out.append(int(h[:8], 16) / float(0x7FFFFFFF) - 1.0)
    return out


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    tables: int = 16,
    bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each vector gets ``tables`` signatures of ``bits`` sign bits; query and
    candidate join on (table, signature). The hyperplanes are literal arrays
    broadcast with the plan (a few KB) — no RNG on executors, fully
    reproducible.

    Tuning: P(bit agrees) = 1 - theta/pi, recall ~= 1-(1-p^bits)^tables.
    The defaults (4 bits x 16 tables) target weakly-clustered corpora where
    true neighbors sit at cosine ~0.3 (recall ~0.9). On a real embedding
    corpus where near-duplicates are cosine >= 0.9, use bits=8/tables=6 —
    far fewer candidate collisions, same recall. Verified against the exact
    operator in tests/test_operators.py.
    """
    planes = [
        [ _hyperplane(t, b, dim) for b in range(bits) ] for t in range(tables)
    ]

    def signature(vec: Column, t: int) -> Column:
        bits_c = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(x) for x in planes[t][b]]),
                        lambda v, p: v.cast("double") * p,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for b in range(bits)
        ]
        return F.concat(*bits_c)

    def with_sigs(df: DataFrame, ident: str) -> DataFrame:
        sigs = F.array(
            *[
                F.struct(F.lit(t).alias("table"), signature(F.col(vec_col), t).alias("sig"))
                for t in range(tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(ident), F.col(vec_col).alias(f"{ident}_vec"),
            F.explode(sigs).alias("ts"),
        ).select(ident, f"{ident}_vec", F.col("ts.table").alias("table"), F.col("ts.sig").alias("sig"))

    qs = with_sigs(queries, "query_id")
    cs = with_sigs(corpus, "candidate_id")
    cand = (
        cs.join(F.broadcast(qs), ["table", "sig"])
        .filter(F.col("candidate_id") != F.col("query_id"))
        .select("query_id", "query_id_vec", "candidate_id", "candidate_id_vec")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "candidate_id",
        F.round(
            _dot(F.col("query_id_vec"), F.col("candidate_id_vec"))
            / (_norm(F.col("query_id_vec")) * _norm(F.col("candidate_id_vec"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cosine", "rank")
    )

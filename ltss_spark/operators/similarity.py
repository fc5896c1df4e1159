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

import math

import numpy as np
import pandas as pd
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
    """L2 norm, with zero mapped to NULL: cosine against a zero vector is
    undefined, and under Spark 4's default ANSI mode a raw 0.0 divisor
    raises DIVIDE_BY_ZERO and kills the whole job (r12 self-review,
    reproduced live). NULL instead propagates through every
    ``dot/(nrm*nrm)`` consumer: threshold filters drop the pair, DESC
    rankings sort it last — a zero vector simply participates in no
    similarity, matching the numpy kernels' explicit nrm>0 guards."""
    return F.nullif(
        F.sqrt(
            F.aggregate(
                a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        ),
        F.lit(0.0),
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
    # norms once per row BEFORE the join (1 fold per pair instead of 3 —
    # the fold runs interpreted, so this is the per-pair hot cost); the
    # division is per-pair IEEE arithmetic either way, results identical
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_nrm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("candidate_id") != F.col("query_id"))
        .select(
            "query_id",
            "candidate_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_nrm") * F.col("c_nrm")),
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


def _sig_udf(tables: int, bits: int, dim: int):
    """Arrow-batched hyperplane-sign signatures: vector -> array of
    ``tables`` bit-string signatures (element t = table t's ``bits`` sign
    bits).

    The earlier pure-expression form (fold over zip_with per plane) was
    correct but ran interpreted — higher-order functions don't enter
    whole-stage codegen, and tables*bits*dim mult-adds per vector dominated
    the query. Here each Arrow batch does ONE (N x dim) @ (dim x
    tables*bits) numpy matmul and a vectorized bit-pack; the plane matrix
    (a few KB, md5-derived so reproducible anywhere) ships with the
    closure. Map-side only — the operator's shuffle shape is unchanged."""
    from pyspark.sql.functions import pandas_udf

    mat_t = _sig_matrix_t(tables, bits, dim)

    @pandas_udf("array<string>")
    def sigs(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        return pd.Series(_sig_kernel(v.tolist(), tables, bits, dim, mat_t))

    return sigs


def _sig_matrix_t(tables: int, bits: int, dim: int) -> "np.ndarray":
    """(dim x tables*bits) transposed hyperplane matrix for _sig_kernel."""
    mat = np.empty((tables * bits, dim), dtype=np.float64)
    for t in range(tables):
        for b in range(bits):
            mat[t * bits + b] = _hyperplane(t, b, dim)
    return mat.T.copy()


def _sig_kernel(vals, tables: int, bits: int, dim: int, mat_t) -> list:
    """The signature computation itself: list of vectors -> list of
    per-vector signature lists. NULL or wrong-length vectors get an EMPTY
    signature list: they fall out of the posexplode and can never collide
    — the same "null matches nothing" semantics the old pure-expression
    form had, instead of np.stack crashing the whole task."""
    valid = [i for i, x in enumerate(vals) if x is not None and len(x) == dim]
    out: list[list[str]] = [[] for _ in vals]
    if valid:
        vecs = np.stack([np.asarray(vals[i], dtype=np.float64) for i in valid])
        chars = np.where(vecs @ mat_t >= 0, "1", "0").astype("U1")
        packed = [
            np.ascontiguousarray(chars[:, t * bits : (t + 1) * bits])
            .view(f"<U{bits}")
            .ravel()
            for t in range(tables)
        ]
        rows = np.stack(packed, axis=1).tolist()
        for i, sig in zip(valid, rows):
            out[i] = sig
    return out


def _seq_norm(vec) -> float | None:
    """Driver-side L2 norm, BIT-IDENTICAL to the :func:`_norm` fold: the
    same sequential left-to-right ``acc + x*x`` over IEEE doubles (Python
    floats ARE binary64, ``math.sqrt`` is the same correctly-rounded sqrt
    as ``F.sqrt``), a NULL element propagates to NULL exactly like the
    fold's ``acc + NULL``, and zero maps to None like the nullif guard."""
    if vec is None:
        return None
    acc = 0.0
    for x in vec:
        if x is None:
            return None
        acc = acc + float(x) * float(x)
    n = math.sqrt(acc)
    return None if n == 0.0 else n


def _local_query_sigs(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    tables: int,
    bits: int,
    dim: int,
) -> DataFrame:
    """The probe side of :func:`cosine_topk_lsh` as a driver-computed
    LocalTableScan: (query_id, q_vec, q_nrm, table, sig), one row per
    (query, table) — exactly the rows ``with_sigs`` produced distributed.

    The probe set is the BROADCAST side by contract (it is collected to
    the driver for the hash relation either way), so collecting it first
    is the same memory class — and it replaces a second corpus-table scan
    plus a whole ArrowEvalPython stage with one bounded collect. Re-A/B'd
    r13 now that local_frame plans as a pure-JVM LocalTableScan (the r11
    rejection predates localrel and measured the PICKLED-RDD local route):
    interleaved min-of-6 at sf0.1, rows identical — 1.059 -> 0.752 s
    quiet-ish, 2.33 -> 1.33 s contended. Signature values come from the
    SAME :func:`_sig_kernel`; norms from :func:`_seq_norm` (bit-identical
    to the fold); NULL / wrong-width vectors emit no rows, exactly like
    the empty signature list in the distributed form."""
    from ltss_spark.localrel import local_frame

    mat_t = _sig_matrix_t(tables, bits, dim)
    qrows = queries.select(id_col, vec_col).collect()
    vals = [r[vec_col] for r in qrows]
    sigs = _sig_kernel(vals, tables, bits, dim, mat_t)
    rows = []
    for r, sig_list, v in zip(qrows, sigs, vals):
        if not sig_list:
            continue  # NULL / wrong-width vector: collides with nothing
        nrm = _seq_norm(v)
        vv = [None if x is None else float(x) for x in v]
        for t, s in enumerate(sig_list):
            rows.append((r[id_col], vv, nrm, t, s))
    id_dt = queries.schema[id_col].dataType.simpleString()
    return local_frame(
        queries.sparkSession,
        rows,
        f"query_id {id_dt}, query_id_vec array<double>, "
        "query_id_nrm double, table int, sig string",
    )


def _infer_dim(corpus: DataFrame, vec_col: str, sample: int = 64) -> int:
    """Embedding width from the data: the safe default for every dim
    parameter below. A hardcoded wrong width would silently exclude EVERY
    vector from the length gates and return empty results (LSH signatures /
    codebook seeds) instead of erroring.

    Takes the MODAL length over a small LIMIT-``sample`` probe, not the
    first row's length — if the arbitrary first row happens to be a
    malformed (wrong-width) vector, a first()-based inference would gate
    out every VALID vector instead (the exact failure mode this helper
    exists to prevent). A strict-majority mismatch still raises: a corpus
    where most sampled vectors disagree on width is a data bug the caller
    must see, not silently half-process."""
    lens = [
        r["n"]
        for r in (
            corpus.select(F.size(F.col(vec_col)).alias("n"))
            .filter(F.col(vec_col).isNotNull())
            .limit(sample)
            .collect()
        )
    ]
    if not lens:
        raise ValueError(f"cannot infer embedding dim: no non-null {vec_col!r} values")
    from collections import Counter

    (dim, n_modal), total = Counter(lens).most_common(1)[0], len(lens)
    # <=, not <: an exact 50/50 width split has no majority either — the
    # most_common winner would be insertion-order arbitrary
    if n_modal * 2 <= total:
        raise ValueError(
            f"cannot infer embedding dim: no majority width in sample "
            f"(counts={dict(Counter(lens))})"
        )
    return dim


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    tables: int = 16,
    bits: int = 4,
    dim: int | None = None,
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

    if dim is None:
        dim = _infer_dim(corpus, vec_col)
    sig_udf = _sig_udf(tables, bits, dim)

    def with_sigs(df: DataFrame, ident: str) -> DataFrame:
        # norm computed once per input row, BEFORE the posexplode fans the
        # row out 'tables' times and before any join multiplies it further
        return df.select(
            F.col(id_col).alias(ident),
            F.col(vec_col).alias(f"{ident}_vec"),
            _norm(F.col(vec_col)).alias(f"{ident}_nrm"),
            F.posexplode(sig_udf(F.col(vec_col))).alias("table", "sig"),
        )

    # probe-side signatures are computed DRIVER-SIDE (bounded: the probe
    # set is the broadcast side by contract) and planned as a pure-JVM
    # LocalTableScan — one collect replaces a second corpus scan + a
    # whole ArrowEvalPython stage (r13 re-A/B of the r11 rejection, which
    # predates localrel and measured the pickled-RDD local route; see
    # _local_query_sigs for the numbers). The corpus side stays the
    # distributed Arrow kernel — it is unbounded.
    qs = _local_query_sigs(queries, id_col, vec_col, tables, bits, dim)
    cs = with_sigs(corpus, "candidate_id")
    # score per collision row, then dedupe multi-table collisions by id —
    # a distinct over the raw vector columns would hash 64-float arrays
    # through a shuffle; re-scoring a duplicate pair is far cheaper.
    # The explicit repartition on query_id alone establishes the ONE
    # partitioning both downstream steps need (guide §2.4): hash(query_id)
    # co-locates every (query_id, candidate_id) group, so the dedup
    # aggregate reuses it instead of exchanging on the pair key, and the
    # top-k window reuses it again — 2 hash exchanges -> 1 (r12 interleaved
    # A/B at sf0.1: 0.865 -> 0.705 s min-of-6, rows identical). Skew is
    # unchanged: the per-query window was already the concentration point.
    scored = (
        cs.join(F.broadcast(qs), ["table", "sig"])
        .filter(F.col("candidate_id") != F.col("query_id"))
        .select(
            "query_id",
            "candidate_id",
            F.round(
                _dot(F.col("query_id_vec"), F.col("candidate_id_vec"))
                / (F.col("query_id_nrm") * F.col("candidate_id_nrm")),
                6,
            ).alias("cosine"),
        )
        .repartition("query_id")
        .groupBy("query_id", "candidate_id")
        .agg(F.first("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cosine", "rank")
    )


def cap_pairs_per_vector(pairs: DataFrame, m: int) -> DataFrame:
    """Bound a similarity pair set to ~m pairs per vector: keep a pair iff
    it ranks in the top-m (cosine desc, partner id asc — deterministic) for
    at least ONE of its endpoints.

    The 100 TB guard for pair MATERIALIZATION (VERDICT r4): on a dense
    corpus the number of pairs >= threshold grows superlinearly with n even
    when the candidate generation is linear (the probe measured ~n^1.6 on
    the synthetic corpus), so an uncapped output step eventually dominates
    everything downstream. Capping at top-m per endpoint bounds the output
    at m*n rows while preserving each vector's strongest links — for the
    connected-components consumer, the nearest-neighbor edge that stitches
    a duplicate cluster together is by construction a top-1 edge, so
    cluster connectivity survives the cap. Mirrors the hot-shingle df-cap
    (dedup.py ngram_jaccard_pairs): deterministic, window-expressible, and
    oracle-checkable (ext_dedup_embed_capped audits kept vs truncated
    per-vector counts against DuckDB).

    Ranking is over each vector's FULL neighbor list (both pair
    orientations — a vector is id_a against larger ids and id_b against
    smaller ones), so "top-m" means the vector's m strongest links, not
    its m strongest same-role links. One symmetrize-explode (2x pair
    rows), one window, one semi-join back — the set being bounded is the
    expensive thing, so the extra shuffle is the cheap part of the trade.
    """
    sym = pairs.select(
        "id_a", "id_b", "cosine", F.col("id_a").alias("__vid"), F.col("id_b").alias("__partner")
    ).unionAll(
        pairs.select(
            "id_a", "id_b", "cosine", F.col("id_b").alias("__vid"), F.col("id_a").alias("__partner")
        )
    )
    w = Window.partitionBy("__vid").orderBy(
        F.col("cosine").desc(), F.col("__partner").asc()
    )
    keep = (
        sym.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= m)
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs.join(keep, ["id_a", "id_b"], "semi")


def embedding_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    exact_limit: int | None = 100_000,
    tables: int = 16,
    bits: int = 4,
    dim: int | None = None,
    method: str = "auto",
    max_pairs_per_vector: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b), a < b, with
    cosine(a, b) >= threshold (rounded to 6 for cross-engine determinism).
    Norms are computed ONCE per vector before any join (not once per pair).

    ``method`` pins the candidate strategy:

    - ``'exact'`` — all-pairs broadcast self-join, |V|^2 comparisons with a
      linear shuffle. The verify/oracle baseline: complete at any size, and
      what the registered ``ext_dedup_embed`` entry uses so its DuckDB
      all-pairs oracle stays valid at EVERY scale factor.
    - ``'lsh'`` — hyperplane-sign LSH buckets (same signature machinery as
      :func:`cosine_topk_lsh`); only colliding pairs are scored — the
      100 TB shape. Approximate: recall follows 1-(1-p^bits)^tables, ~0.89
      at the default 4x16 for cosine 0.3, higher for tighter thresholds.
    - ``'auto'`` (default) — exact up to ``exact_limit`` vectors, LSH
      above. Callers who need the complete-pairs contract regardless of
      corpus size must pass ``method='exact'`` explicitly; auto is a
      SCALE guard, not a semantics guarantee (VERDICT r1).

    ``max_pairs_per_vector`` bounds the OUTPUT (not the candidates): keep
    each pair only if it is a top-m link of one of its endpoints — see
    :func:`cap_pairs_per_vector` for why pair materialization needs its
    own guard at 100 TB even with linear candidate generation.
    """
    if method not in ("auto", "exact", "lsh"):
        raise ValueError(f"method must be auto|exact|lsh, got {method!r}")
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )

    def score(pairs: DataFrame) -> DataFrame:
        return pairs.select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("vec_a"), F.col("vec_b")) / (F.col("nrm_a") * F.col("nrm_b")), 6
            ).alias("cosine"),
        ).filter(F.col("cosine") >= threshold)

    a = base.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b")
    )
    # auto: exact below the size bound; exact_limit=None reads as
    # UNBOUNDED exact (the natural meaning of "no limit" — previously the
    # falsy None silently flipped to the approximate path, the opposite,
    # r12 self-review)
    use_exact = method == "exact" or (
        method == "auto"
        and (
            exact_limit is None
            or corpus.limit(exact_limit + 1).count() <= exact_limit
        )
    )
    def capped(pairs: DataFrame) -> DataFrame:
        if max_pairs_per_vector is None:
            return pairs
        return cap_pairs_per_vector(pairs, max_pairs_per_vector)

    if use_exact:
        return capped(score(a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))))

    if dim is None:
        dim = _infer_dim(corpus, vec_col)
    sigs = base.select(
        "id",
        "vec",
        "nrm",
        F.posexplode(_sig_udf(tables, bits, dim)(F.col("vec"))).alias("table", "sig"),
    )
    sa = sigs.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
        F.col("nrm").alias("nrm_a"), "table", "sig",
    )
    sb = sigs.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
        F.col("nrm").alias("nrm_b"), "table", "sig",
    )
    # equi-join on (table, sig) buckets; multi-table collisions are deduped
    # AFTER scoring (groupBy ids) — re-scoring a duplicate pair is cheaper
    # than shuffling 64-float arrays through a distinct
    return capped(
        score(sa.join(sb, ["table", "sig"]).filter(F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.first("cosine").alias("cosine"))
    )


def stride_codebook(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    dim: int | None = None,
    seed_hash: str = "xxhash64",
) -> DataFrame:
    """Deterministic seed codebook: the ``n_centroids`` vectors with the
    smallest ``seed_hash``(id) — a TakeOrdered top-k (map-side partial, no
    full sort shuffle), valid for string/UUID/sparse ids where modular
    arithmetic on the id would under-sample or fail to resolve. Columns
    (centroid_id, cent_vec, cent_nrm). When ``dim`` is given, wrong-length
    vectors are excluded too — a malformed vector must not become a coarse
    centroid (it would NULL out every assignment cosine against it).

    ``seed_hash``: 'xxhash64' (default — the cheap 8-byte hash, fine for
    production) or 'md5' (the registry's cross-engine hash: DuckDB's
    md5() produces the identical lowercase hex string, so an oracle can
    replay the exact seed sample — the rule the registry docstring pins:
    only md5 is bit-identical everywhere)."""
    keep = F.col("cent_vec").isNotNull()
    if dim is not None:
        keep = keep & (F.size("cent_vec") == dim)
    if seed_hash == "xxhash64":
        h = F.xxhash64(F.col("cid").cast("string"))
    elif seed_hash == "md5":
        h = F.md5(F.col("cid").cast("string"))
    else:
        raise ValueError(f"seed_hash must be xxhash64|md5, got {seed_hash!r}")
    sampled = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cent_vec"))
        .filter(keep)
        .withColumn("__h", h)
        .orderBy("__h", "cid")
        .limit(n_centroids)
    )
    w = Window.orderBy("__h", "cid")
    return sampled.select(
        F.row_number().over(w).cast("int").alias("centroid_id"),
        "cent_vec",
        _norm(F.col("cent_vec")).alias("cent_nrm"),
    )


def _assign_nearest_arrow(
    base: DataFrame, codebook: DataFrame, id_dt: str, with_vec: bool
) -> DataFrame:
    """Vectorized nearest-centroid assignment: ONE (B x dim) @ (dim x C)
    float64 matmul per Arrow batch against the driver-collected codebook
    (bounded: C x dim doubles — KBs at typical C; the C ∝ N deployment
    rule caps it at ~10^5 centroids for 10^7-vector shards, still MBs).
    mapInPandas is a NARROW transform — no shuffle, no join-back; the
    vector (and its norm) ride through the kernel when the caller needs
    them downstream.

    Tie-break matches the fold path (smallest centroid_id wins):
    centroids are column-ordered by centroid_id and np.argmax returns the
    FIRST maximum. Summation order inside the matmul differs from the
    sequential fold, so near-tie cosines can argmax differently in the
    last ulp — why the value-hash-oracled registry entry keeps the fold
    and this kernel serves the production/scale path (the same contract
    split as _cell_local_topk).

    Degenerate inputs (ADVICE r9): rows with NULL/wrong-width/zero-norm
    vectors are DROPPED (a malformed vector has no meaningful
    assignment), so assign='arrow' can return FEWER rows than |corpus| —
    a deliberate, documented divergence from the fold path, which carries
    such rows through with whatever NULL-ignoring max_by yields.
    Zero-/non-finite-norm CENTROIDS are excluded from the collected
    codebook (they would turn a whole cosine column into NaN/inf), and
    any residual non-finite cosine is forced to -inf so np.argmax can
    never select a garbage column (argmax returns the first NaN
    otherwise)."""
    rows = [
        r
        for r in codebook.orderBy("centroid_id").collect()  # bounded: C rows
        if r["cent_nrm"] is not None
        and np.isfinite(r["cent_nrm"])
        and r["cent_nrm"] > 0
    ]
    if not rows:
        schema = f"vec_id {id_dt}, centroid_id int" + (
            ", vec array<double>, nrm double" if with_vec else ""
        )
        return base.sparkSession.createDataFrame([], schema)
    cids = np.array([r["centroid_id"] for r in rows], dtype=np.int64)
    C = np.stack([np.asarray(r["cent_vec"], dtype=np.float64) for r in rows])
    cn = np.array([r["cent_nrm"] for r in rows], dtype=np.float64)
    dim = C.shape[1]

    def assign(batches):
        for pdf in batches:
            ok = [
                v is not None
                and len(v) == dim
                and n is not None
                and np.isfinite(n)
                and n > 0
                for v, n in zip(pdf["vec"], pdf["nrm"])
            ]
            pdf = pdf[ok]
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            cos = (V @ C.T) / np.outer(pdf["nrm"].to_numpy(), cn)
            cos[~np.isfinite(cos)] = -np.inf  # non-finite coords, never win
            best = np.argmax(cos, axis=1)  # first max = smallest centroid_id
            out = {
                "vec_id": pdf["vec_id"].to_numpy(),
                "centroid_id": cids[best].astype("int32"),
            }
            if with_vec:
                out["vec"] = pdf["vec"]
                out["nrm"] = pdf["nrm"].to_numpy()
            yield pd.DataFrame(out)

    schema = f"vec_id {id_dt}, centroid_id int" + (
        ", vec array<double>, nrm double" if with_vec else ""
    )
    return base.select(
        "vec_id", F.col("vec").cast("array<double>").alias("vec"), "nrm"
    ).mapInPandas(assign, schema)


def kmeans_refine_codebook(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 1,
    exact: bool = False,
    assign: str = "fold",
) -> DataFrame:
    """Lloyd iterations over the coarse codebook, all DataFrame ops: assign
    every vector to its nearest centroid (broadcast codebook, argmax
    cosine), then recompute each centroid as the per-dimension mean of its
    members (posexplode -> (centroid, dim) hash agg -> array rebuild).
    Work per iter: one narrow assignment pass + one |V| x dim shuffle of
    scalar triples — no vector ever crosses the wire twice. Empty clusters
    keep their previous centroid (standard k-means practice).

    ``exact=True`` switches the per-dimension mean from fp ``avg`` (whose
    value depends on executor summation order) to the repo's micro-unit
    LONG discipline: each member contribution quantizes to integer
    micro-units via TIE-FREE ``floor(x*1e6 + 0.5)`` (pure IEEE ops on the
    binary double — bit-identical in any engine, immune to the
    Spark-vs-DuckDB round() repr-tie hazard, ADVICE r9), sums exactly
    (order-free), and the mean is ONE double division
    ``sum_micro / (n * 1e6)`` — per-row IEEE, bit-identical in
    any engine at any partitioning. Quantization error ≤ 5e-7 per
    coordinate per pass, irrelevant to clustering and the price of a
    hash-checkable Lloyd (the ext_pagerank pattern applied to k-means).

    ``assign``: 'fold' (default — the interpreted zip_with fold, per-row
    IEEE, the form a SQL oracle can replay bit-exactly) or 'arrow' (the
    scale path — :func:`_assign_nearest_arrow`'s blocked matmul; with the
    paper's C ∝ N centroid rule the assignment is O(N·C·dim) flops, and
    at 32x the probe measured the interpreted fold at 75 s where the
    matmul runs the same flops vectorized)."""
    if assign not in ("fold", "arrow"):
        raise ValueError(f"assign must be fold|arrow, got {assign!r}")
    base = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    id_dt = corpus.schema[id_col].dataType.simpleString()
    for _ in range(iters):
        if assign == "arrow":
            assigned = _assign_nearest_arrow(
                base, codebook, id_dt, with_vec=True
            )
        else:
            assigned = (
                base.join(F.broadcast(codebook), how="cross")
                .select(
                    "vec_id", "vec",
                    "centroid_id",
                    (_dot(F.col("vec"), F.col("cent_vec")) / (F.col("nrm") * F.col("cent_nrm"))).alias("c"),
                )
                .groupBy("vec_id")
                .agg(
                    F.max_by("centroid_id", F.struct(F.col("c"), -F.col("centroid_id"))).alias("centroid_id"),
                    F.first("vec").alias("vec"),
                )
            )
        dims = assigned.select(
            "centroid_id", F.posexplode(F.col("vec")).alias("pos", "val")
        )
        if exact:
            # TIE-FREE integer quantization (ADVICE r9): floor(x*1e6 + 0.5)
            # is pure IEEE multiply/add/floor on the binary double —
            # bit-identical in Spark and DuckDB — where round(x*1e6, 0)
            # diverges on repr-ties (Spark HALF_UPs the shortest decimal
            # repr, DuckDB rounds the binary value half-away-from-zero)
            mean_expr = (
                F.sum(
                    F.floor(
                        F.col("val").cast("double") * F.lit(1e6) + F.lit(0.5)
                    )
                ).cast("double")
                / (F.count(F.lit(1)) * F.lit(1e6))
            ).alias("m")
        else:
            mean_expr = F.avg(F.col("val").cast("double")).alias("m")
        means = (
            dims.groupBy("centroid_id", "pos")
            .agg(mean_expr)
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("cent_vec")
            )
        )
        # empty clusters: keep the old centroid
        kept = codebook.select("centroid_id", F.col("cent_vec").alias("old_vec"))
        codebook = (
            kept.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("cent_vec"), F.col("old_vec")).alias("cent_vec"),
            )
            .select("centroid_id", "cent_vec", _norm(F.col("cent_vec")).alias("cent_nrm"))
        )
    return codebook


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_iters: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer — the
    FAISS-IVF-flat shape re-expressed as DataFrame ops.

    ``dim``, when given, excludes wrong-length vectors from the codebook
    seeds (a malformed vector must not become a centroid); None (default)
    skips the length gate rather than guessing a dimension — a wrong
    hardcoded default would silently empty the codebook for any corpus of
    a different width.

    - Codebook: stride-sampled seeds, optionally refined with
      ``train_iters`` Lloyd iterations (:func:`kmeans_refine_codebook`).
    - Assignment: corpus x broadcast(codebook) -> argmax cosine per vector
      (one narrow pass, |V| x C comparisons, no shuffle of the corpus).
    - Search: each query probes its nprobe nearest centroids and scores
      ONLY vectors assigned to those lists — work scales with
      |V| * nprobe / n_centroids instead of |V|.

    With nprobe == n_centroids the result is EXACTLY brute force (tested);
    recall degrades gracefully as nprobe shrinks.
    """
    codebook = stride_codebook(corpus, id_col, vec_col, n_centroids, dim=dim)
    if train_iters > 0:
        codebook = kmeans_refine_codebook(
            corpus, codebook, id_col, vec_col, iters=train_iters
        )

    def assign(df: DataFrame, ident: str, keep_n: int) -> DataFrame:
        scored = df.select(
            F.col(id_col).alias(ident),
            F.col(vec_col).alias(f"{ident}_vec"),
            _norm(F.col(vec_col)).alias(f"{ident}_nrm"),
        ).join(F.broadcast(codebook), how="cross").select(
            ident,
            f"{ident}_vec",
            f"{ident}_nrm",
            "centroid_id",
            (
                _dot(F.col(f"{ident}_vec"), F.col("cent_vec"))
                / (F.col(f"{ident}_nrm") * F.col("cent_nrm"))
            ).alias("cent_cos"),
        )
        ww = Window.partitionBy(ident).orderBy(
            F.col("cent_cos").desc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("crank", F.row_number().over(ww))
            .filter(F.col("crank") <= keep_n)
            .drop("crank", "cent_cos")
        )

    lists = assign(corpus, "candidate_id", 1)
    probes = assign(queries, "query_id", nprobe)
    # no dedup needed: each candidate lives in exactly ONE list (keep_n=1
    # above — the knn_join invariant), so a (query, candidate) pair can
    # arise from at most one centroid join row; the former .distinct()
    # shuffled full query+candidate vectors per search for nothing (r12
    # self-review)
    cand = (
        lists.join(probes, "centroid_id")
        .filter(F.col("candidate_id") != F.col("query_id"))
        .select("query_id", "query_id_vec", "query_id_nrm",
                "candidate_id", "candidate_id_vec", "candidate_id_nrm")
    )
    scored = cand.select(
        "query_id",
        "candidate_id",
        F.round(
            _dot(F.col("query_id_vec"), F.col("candidate_id_vec"))
            / (F.col("query_id_nrm") * F.col("candidate_id_nrm")),
            6,
        ).alias("cosine"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cosine", "rank")
    )


def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    kc: int = 16,
    dim: int | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: ``m`` subspaces of dim/m dims, each
    with ``kc`` centroids taken from stride-sampled corpus vectors (the
    same deterministic seeding as :func:`stride_codebook`). Returns
    codebooks[m][c] = centroid subvector — a few KB collected to the
    driver and shipped to executors as plan literals, exactly like a
    broadcast dimension."""
    if dim is None:
        dim = _infer_dim(corpus, vec_col)
    if dim % m != 0:
        # fail loudly (the _infer_dim rule): with dim not divisible by m,
        # pq_encode would recompute dim = m*(dim//m) and its width filter
        # would silently exclude EVERY real vector — an empty ANN result
        # with no error (r12 self-review)
        raise ValueError(
            f"pq_codebooks: embedding dim {dim} is not divisible by "
            f"m={m} subspaces; choose m dividing the dimension"
        )
    d_sub = dim // m
    # id-type-agnostic deterministic sample: the kc rows with the smallest
    # xxhash64(id) — a TakeOrdered top-k (map-side partial, no full sort),
    # valid for string/UUID/sparse ids where the previous `id % stride`
    # arithmetic silently under-sampled or failed to resolve
    rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("v"))
        .filter(F.col("v").isNotNull() & (F.size("v") == dim))
        .withColumn("__h", F.xxhash64(F.col("cid").cast("string")))
        .orderBy("__h", "cid")
        .limit(kc)
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebooks: corpus has no valid vectors to sample")
    return [
        [[float(x) for x in r["v"][mm * d_sub : (mm + 1) * d_sub]] for r in rows]
        for mm in range(m)
    ]


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` centroid indices (the PQ code): per
    subspace, argmin squared-L2 against the literal codebook. 64 floats
    become m bytes — the compression that lets a 100 TB embedding corpus
    fit a scan budget. Arrow-batched numpy kernel (same rationale as
    `_sig_udf`: m*kc*dim mult-adds per vector is a dense numeric kernel
    that interpreted expression folds run ~20x slower); the codebook array
    (a few KB) ships with the closure. Map-side only; numpy argmin ties
    break to the lowest centroid id (deterministic)."""
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    if m == 0 or not codebooks[0] or not codebooks[0][0]:
        raise ValueError("pq_encode: empty codebooks (was the corpus empty?)")
    d_sub = len(codebooks[0][0])
    dim = m * d_sub
    books = np.asarray(codebooks, dtype=np.float64)  # (m, kc, d_sub)

    @pandas_udf("array<int>")
    def codes_udf(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        vecs = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        subs = vecs.reshape(len(vecs), m, d_sub)  # (n, m, d_sub)
        # squared L2 to every centroid: (n, m, kc)
        d2 = ((subs[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)
        return pd.Series(d2.argmin(axis=2).astype("int32").tolist())

    # NULL / wrong-length vectors are unencodable — excluded here rather
    # than crashing the Arrow kernel's np.stack
    corpus = corpus.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    )
    out = corpus.select(
        F.col(id_col).alias("candidate_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_nrm"),
        codes_udf(F.col(vec_col)).alias("__codes"),
    )
    return out.select(
        "candidate_id",
        "c_vec",
        "c_nrm",
        *[F.element_at("__codes", mm + 1).alias(f"code{mm}") for mm in range(m)],
    )


def _query_luts(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Per-query ADC lookup tables AS A DATAFRAME — (query_id, q_vec,
    q_nrm, lut) where lut[m][c] = dot(query_sub_m, codebooks[m][c]).

    This replaces the former per-query driver loop (VERDICT r2 "What's
    wrong" #1): LUTs were Python-computed per collected query row and
    inlined as plan literals, so plan size and driver work grew linearly in
    |queries|. Here ONE Arrow batch kernel (an einsum over the whole query
    batch) computes every LUT executor-side, and the query frame is
    broadcast-joined onto the encoded corpus — constant plan size at any
    probe count.

    Query vectors mirror the pq_encode candidate guard (ADVICE r2):
    NULL / wrong-length / zero-norm queries are unsearchable and are
    filtered out rather than raising on the driver or dividing by zero.
    """
    from pyspark.sql.functions import pandas_udf

    books = np.asarray(codebooks, dtype=np.float64)  # (m, kc, d_sub)
    m, _kc, d_sub = books.shape
    dim = m * d_sub

    @pandas_udf("array<array<double>>")
    def lut_udf(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        vecs = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        subs = vecs.reshape(len(vecs), m, d_sub)
        lut = np.einsum("nmd,mkd->nmk", subs, books)
        return pd.Series(lut.tolist())

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_nrm"),
    ).filter(
        F.col("q_vec").isNotNull()
        & (F.size("q_vec") == dim)
        & (F.col("q_nrm") > 0)
    )
    return q.select("query_id", "q_vec", "q_nrm", lut_udf(F.col("q_vec")).alias("lut"))


def _adc_topk(encoded: DataFrame, qframe: DataFrame, m: int, k: int, rerank: int,
              on: list[str] | None = None) -> DataFrame:
    """Broadcast-LUT ADC scan + exact rescore for ALL queries in one plan:
    the shared scoring core of :func:`cosine_topk_pq` (full scan) and
    :func:`cosine_topk_ivfpq` (scan restricted to the probed inverted
    lists via ``on=["centroid_id"]``). The approximate dot is a
    deterministic left fold of m LUT lookups on the candidate's code
    columns — no raw candidate vector is read until the exact rescore of
    the top ``rerank``."""
    if on:
        # the equi-join key (probed list membership) says nothing about
        # identity — exclude self-matches as a residual filter
        cand = encoded.join(F.broadcast(qframe), on).filter(
            F.col("candidate_id") != F.col("query_id")
        )
    else:
        cand = encoded.join(
            F.broadcast(qframe), F.col("candidate_id") != F.col("query_id")
        )
    codes = F.array(*[F.col(f"code{mm}") for mm in range(m)])
    adc_dot = F.aggregate(
        F.zip_with(
            F.col("lut"), codes,
            lambda l, c: F.element_at(l, (c + F.lit(1)).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cand.select(
        "query_id",
        "candidate_id",
        "q_vec",
        "q_nrm",
        "c_vec",
        "c_nrm",
        (adc_dot / (F.col("q_nrm") * F.col("c_nrm"))).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("candidate_id").asc()
    )
    pool = scored.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= rerank)
    rescored = pool.select(
        "query_id",
        "candidate_id",
        F.round(
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_nrm") * F.col("c_nrm")),
            6,
        ).alias("cosine"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cosine", "rank")
    )


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 16,
    kc: int = 16,
    dim: int | None = None,
    rerank: int = 50,
) -> DataFrame:
    """Approximate cosine top-k via product quantization with asymmetric
    distance (ADC) + exact rescore — the FAISS IVFPQ scoring shape:

    1. corpus encoded once to m-byte codes (:func:`pq_encode`);
    2. per query, a lookup table LUT[m][c] = dot(query_sub, centroid) is
       computed by ONE Arrow batch kernel (:func:`_query_luts`) and
       broadcast-joined onto the scan; approximate dot = a fold of m LUT
       lookups per candidate — no per-candidate float vector is touched
       during the scan, and plan size is constant in |queries|;
    3. the top ``rerank`` candidates per query by ADC score are re-scored
       with the EXACT cosine and the true top-k of those is returned.

    Recall bound pinned in tests/test_operators.py. At 100 TB the scan
    reads m code bytes + one norm per candidate instead of the raw
    vectors — 16x less read volume at m=16 / dim=64 float32. Subspace
    width drives approximation quality far more than centroid count
    (measured: 4-dim subspaces 0.87 recall@5 vs 0.40 for 8-dim on the
    weakly-clustered test corpus), so the default is m=16/kc=16.
    """
    if dim is None:
        dim = _infer_dim(corpus, vec_col)
    codebooks = pq_codebooks(corpus, id_col, vec_col, m, kc, dim)
    # encode ONCE and reuse across the per-query scans — in production the
    # codes are materialized to storage next to the corpus; a lazy
    # localCheckpoint is the in-session equivalent (codes are m small ints
    # per vector). Unlike .cache(), checkpoint blocks are released by the
    # ContextCleaner when the plan is garbage-collected, so repeated calls
    # in a long-lived session don't accumulate pinned executor storage.
    encoded = pq_encode(corpus, codebooks, id_col, vec_col).localCheckpoint(
        eager=False
    )
    qframe = _query_luts(queries, codebooks, id_col, vec_col)
    return _adc_topk(encoded, qframe, m, k, rerank)


def cosine_topk_ivfpq(
    corpus,
    queries,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 16,
    kc: int = 16,
    dim: int | None = None,
    rerank: int = 50,
):
    """The full FAISS-IVFPQ composition: an IVF coarse quantizer bounds
    WHICH candidates are scanned (nprobe/n_centroids of the corpus), PQ
    codes bound HOW MUCH is read per candidate (m bytes instead of dim
    floats), and the exact rescore of the top ``rerank`` restores
    precision — the canonical 100 TB ANN shape, where the two bounds
    multiply: scan volume ~ |V| * nprobe/n_centroids * m/(4*dim) of the
    raw-corpus baseline.

    Plan: corpus is PQ-encoded and coarse-assigned ONCE (one broadcast
    join + per-row argmax, lazily checkpointed); the query side is
    coarse-assigned the same way (broadcast codebook, top-nprobe window —
    no driver loop), and the probed scan is an equi-join on centroid_id
    (partition-prunable when the encoded table is written partitioned by
    list, as FAISS shards by list) into the shared ADC scan + exact
    rescore. With nprobe == n_centroids the result is EXACTLY
    cosine_topk_pq (tested).
    """
    if dim is None:
        dim = _infer_dim(corpus, vec_col)
    coarse = stride_codebook(corpus, id_col, vec_col, n_centroids, dim=dim)
    codebooks = pq_codebooks(corpus, id_col, vec_col, m, kc, dim)
    enc = pq_encode(corpus, codebooks, id_col, vec_col)
    # one nearest coarse centroid per candidate: broadcast the (tiny)
    # codebook and keep the argmax row — same shape as cosine_topk_ivf
    assigned = (
        enc.join(F.broadcast(coarse), how="cross")
        .select(
            "*",
            (
                _dot(F.col("c_vec"), F.col("cent_vec"))
                / (F.col("c_nrm") * F.col("cent_nrm"))
            ).alias("cent_cos"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("candidate_id").orderBy(
                    F.col("cent_cos").desc(), F.col("centroid_id").asc()
                )
            ),
        )
        .filter(F.col("crank") == 1)
        .drop("crank", "cent_cos", "cent_vec", "cent_nrm")
    )
    encoded = assigned.localCheckpoint(eager=False)
    # query side: LUTs + nprobe nearest coarse lists, all executor-side —
    # the probe frame stays (|queries| x nprobe) rows and is broadcast
    qframe = _query_luts(queries, codebooks, id_col, vec_col)
    probes = (
        qframe.join(F.broadcast(coarse), how="cross")
        .select(
            "*",
            (
                _dot(F.col("q_vec"), F.col("cent_vec"))
                / (F.col("q_nrm") * F.col("cent_nrm"))
            ).alias("cent_cos"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cent_cos").desc(), F.col("centroid_id").asc()
                )
            ),
        )
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "q_vec", "q_nrm", "lut", "centroid_id")
    )
    return _adc_topk(encoded, probes, m, k, rerank, on=["centroid_id"])


def knn_join(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    method: str = "exact",
    n_centroids: int = 16,
    nprobe: int = 4,
    train_iters: int = 0,
    dim: int | None = None,
    score: str = "arrow",
) -> DataFrame:
    """Self kNN join: EVERY vector gets its k nearest neighbors —
    ``(vec_id, neighbor_id, cosine, rank)``, ranks 1..k per vector,
    cosine rounded to 6 with neighbor_id tie-break (deterministic). The
    corpus-level building block behind embedding clustering, kNN-graph
    construction, and density-based near-dup mining — distinct from
    :func:`cosine_topk`, whose probe side is a SMALL broadcastable query
    set, not the corpus itself.

    - ``method='exact'`` — brute force via :func:`cosine_topk` with the
      corpus on both sides: |V|^2 comparisons and one broadcast copy of
      the corpus. The correctness baseline; only valid while the corpus
      fits a broadcast.
    - ``method='ivf'`` — the 100 TB shape (FAISS IVF-flat's kNN-join,
      re-expressed declaratively). ONE codebook-assignment pass scores
      every vector against the broadcast KB-scale codebook and derives
      BOTH sides from it: the inverted lists (cell = argmax centroid,
      ``crank == 1``) and the probe fan-out (``crank <= nprobe`` cells
      per vector). Candidates come from an equi-join on ``centroid_id``
      with NEITHER side broadcast, so shuffle and compare work scale
      with |V| * nprobe * avg_cell_size — |V|^2/(C/nprobe) instead of
      |V|^2 — and skew follows cell population, which ``train_iters``
      Lloyd refinement balances. A (probe, member) pair can arise from
      at most ONE cell (members live in exactly one list), so no
      post-join dedup is needed — unlike the multi-table LSH path.
      With ``nprobe == n_centroids`` the result is EXACTLY brute force
      (tested); recall degrades gracefully as nprobe shrinks.

    ``score`` picks the IVF scoring engine. ``'arrow'`` (default) is the
    blocked-matmul shape FAISS actually runs per inverted list: a cogroup
    of (probes, members) per centroid does ONE (P x dim) @ (dim x M)
    numpy matmul and emits only each probe's LOCAL top-k for that cell —
    the global merge window then sees n*nprobe*k rows instead of
    n*nprobe*cell_size (local top-k per block provably contains the
    global top-k: a pair's rank within any one cell is <= its rank over
    all candidate cells). Measured at sf0.1 (2000x64, C=16, nprobe=6):
    ~1.5 M interpreted fold evaluations -> one matmul per cell, entry
    time 6.9 s -> well under 2 s. ``'fold'`` keeps the pure-expression
    zip_with fold (bit-identical to cosine_topk, used by the
    equivalence tests).
    """
    if method == "exact":
        out = cosine_topk(corpus, corpus, id_col, vec_col, k)
        return out.select(
            F.col("query_id").alias("vec_id"),
            F.col("candidate_id").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    if method != "ivf":
        raise ValueError(f"method must be exact|ivf, got {method!r}")

    codebook = stride_codebook(corpus, id_col, vec_col, n_centroids, dim=dim)
    if train_iters > 0:
        codebook = kmeans_refine_codebook(
            corpus, codebook, id_col, vec_col, iters=train_iters
        )
    assigned = (
        corpus.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("nrm"),
        )
        .join(F.broadcast(codebook), how="cross")
        .select(
            "vid",
            "vec",
            "nrm",
            "centroid_id",
            (
                _dot(F.col("vec"), F.col("cent_vec"))
                / (F.col("nrm") * F.col("cent_nrm"))
            ).alias("cent_cos"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("vid").orderBy(
                    F.col("cent_cos").desc(), F.col("centroid_id").asc()
                )
            ),
        )
        .filter(F.col("crank") <= nprobe)
        # lazy cut: the assignment pass feeds BOTH join sides below;
        # without it the physical plan carries the cross+window pipeline
        # once per side (cosine_topk_ivf pays exactly that by calling
        # assign() twice — here the self-join makes the reuse free)
        .localCheckpoint(eager=False)
    )
    lists = assigned.filter(F.col("crank") == 1).select(
        "centroid_id",
        F.col("vid").alias("neighbor_id"),
        F.col("vec").alias("n_vec"),
        F.col("nrm").alias("n_nrm"),
    )
    probes = assigned.select(
        "centroid_id",
        F.col("vid").alias("vec_id"),
        F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    if score == "arrow":
        if dim is None:
            dim = _infer_dim(corpus, vec_col)
        id_dt = corpus.schema[id_col].dataType.simpleString()
        scored = _cell_local_topk(probes, lists, k, dim, id_dt)
    elif score == "fold":
        scored = (
            probes.join(lists, "centroid_id")
            .filter(F.col("vec_id") != F.col("neighbor_id"))
            .select(
                "vec_id",
                "neighbor_id",
                F.round(
                    _dot(F.col("q_vec"), F.col("n_vec"))
                    / (F.col("q_nrm") * F.col("n_nrm")),
                    6,
                ).alias("cosine"),
            )
        )
    else:
        raise ValueError(f"score must be arrow|fold, got {score!r}")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine", "rank")
    )


def _cell_local_topk(
    probes: DataFrame, lists: DataFrame, k: int, dim: int, id_dt: str
) -> DataFrame:
    """Per-inverted-list blocked scoring: cogroup (probes, members) on
    centroid_id; each cell runs ONE (P x dim) @ (dim x M) float64 matmul
    and emits each probe's local top-k for that cell (self-pairs and
    wrong-width vectors excluded). Emitting local top-k bounds the merge
    window's input at n*nprobe*k rows — the cell-size factor never leaves
    the kernel. Cosines are rounded to 6 BEFORE ranking with
    neighbor-id tie-break, mirroring the fold path's determinism
    contract (the summation ORDER inside the matmul differs from the
    sequential fold, so last-ulp doubles can differ pre-round — why
    entries audit this path with recall/coverage invariants rather than
    value-hashing raw cosines against a fold-path oracle)."""

    def cell(key, qdf: pd.DataFrame, mdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"vec_id": [], "neighbor_id": [], "cosine": []}
        )
        if qdf.empty or mdf.empty:
            return empty
        qok = [v is not None and len(v) == dim for v in qdf["q_vec"]]
        mok = [v is not None and len(v) == dim for v in mdf["n_vec"]]
        qdf, mdf = qdf[qok], mdf[mok]
        if qdf.empty or mdf.empty:
            return empty
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in qdf["q_vec"]])
        M = np.stack([np.asarray(v, dtype=np.float64) for v in mdf["n_vec"]])
        cos = np.round(
            (Q @ M.T)
            / np.outer(qdf["q_nrm"].to_numpy(), mdf["n_nrm"].to_numpy()),
            6,
        )
        qids = qdf["vec_id"].to_numpy()
        mids = mdf["neighbor_id"].to_numpy()
        cos[qids[:, None] == mids[None, :]] = -np.inf  # self-pairs out
        # lexsort: neighbor id ascending breaks cosine ties, as the
        # merge window requires for determinism
        order = np.lexsort((mids[None, :].repeat(len(qids), 0), -cos), axis=1)
        take = order[:, :k]
        rows = {
            "vec_id": np.repeat(qids, take.shape[1]),
            "neighbor_id": mids[take].ravel(),
            "cosine": np.take_along_axis(cos, take, axis=1).ravel(),
        }
        out = pd.DataFrame(rows)
        return out[np.isfinite(out["cosine"])]

    return probes.groupBy("centroid_id").cogroup(
        lists.groupBy("centroid_id")
    ).applyInPandas(
        cell, f"vec_id {id_dt}, neighbor_id {id_dt}, cosine double"
    )


def cluster_balance(
    corpus: DataFrame,
    n_centroids: int = 8,
    per_cluster: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Topic-balanced corpus sampling over an embedding column: assign
    every vector to its nearest of ``n_centroids`` anchor vectors (the
    ``n_centroids`` smallest ids — deterministic and engine-reproducible,
    where a k-means codebook would make the oracle chase float iteration
    order), then keep each cluster's ``per_cluster`` most-central members.
    The training-data use: cap any one dominant topic's share of a mix
    (cluster-balanced selection), or pick per-topic exemplars for
    inspection/eval.

    Scale shape at 100 TB:
    - the anchor frame is KB-scale (constant rows), broadcast; assignment
      is ONE linear scan x C — the same bounded BroadcastNestedLoop shape
      as the ANN probe entries, never vector x vector;
    - the per-vector argmax and the per-cluster top-m are both
      rank-filter windows Catalyst rewrites to WindowGroupLimit, so each
      shuffle partition pre-truncates to m rows map-side — the
      corpus-sized cluster membership never sorts through one reducer;
    - cosines round to 6 BEFORE ranking with id tie-breaks (the
      determinism rule every similarity operator here follows).
    """
    cents = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("c_vec"),
            _norm(F.col(vec_col)).alias("c_nrm"),
        )
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("nrm"),
        )
        .join(F.broadcast(cents), how="cross")
        .select(
            "vec_id",
            "centroid_id",
            F.round(
                _dot(F.col("vec"), F.col("c_vec"))
                / (F.col("nrm") * F.col("c_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    aw = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("centroid_id").asc()
    )
    assigned = (
        scored.withColumn("__a", F.row_number().over(aw))
        .filter(F.col("__a") == 1)
        .drop("__a")
    )
    cw = Window.partitionBy("centroid_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        assigned.withColumn("cluster_rank", F.row_number().over(cw).cast("int"))
        .filter(F.col("cluster_rank") <= per_cluster)
        .select("vec_id", "centroid_id", "cosine", "cluster_rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score: str = "fold",
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space, then compare pairs ONLY
    within a cluster — semantic near-dups land in the same cluster, so
    the cross-cluster |V|^2 term is never paid. A vector is a duplicate
    iff some SMALLER-id vector in its cluster exceeds ``threshold``
    cosine (the deterministic keep-lowest rule standing in for the
    paper's keep-random — same dedup pressure, engine-reproducible, and
    it gives every duplicate a concrete witness: ``dup_of`` = the
    smallest such neighbor).

    Returns every vector: (vec_id, centroid_id, is_dup, dup_of).

    Scale shape at 100 TB:
    - assignment is the bounded broadcast-anchor scan (see
      cluster_balance); anchors here are the ``n_centroids`` smallest
      ids, deterministic where trained centroids would make the oracle
      chase float iteration order;
    - the pair stage is an EQUI-join on centroid_id (shuffle ∝ corpus,
      both sides co-partitioned), never a cross join; per-cluster work
      is |cluster|^2 — the paper's own cost model, controlled by scaling
      n_centroids ∝ N so cluster size (and per-vector work) stays
      constant;
    - the witness aggregate (min smaller similar id) is one hash agg.

    ``score`` picks the pair-scoring engine, the same trade as knn_join:
    ``'fold'`` (default) keeps pure zip_with expressions — bit-identical
    to the DuckDB list_dot_product oracle, which is why the registered
    entry uses it; ``'arrow'`` runs ONE |cluster| x |cluster| numpy
    matmul per cluster (applyInPandas). MEASURED crossover (probe,
    dim=64): at the C ∝ N deployment rule's ~125-vector clusters the
    fold is FASTER (1.4 vs 1.9 s at 8×) — the Arrow cogroup round trip
    outweighs a tiny matmul; arrow pays off when per-cluster pair volume
    is large (big clusters, high dim — the regime where knn_join's same
    kernel measured 6.9 → 1.9 s). Pick by cluster size, not by habit.
    Matmul summation order can differ from the fold in the last ulp
    pre-round, so the arrow path is verified by equivalence tests, not
    value-hash oracles.
    """
    cents = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("c_vec"),
            _norm(F.col(vec_col)).alias("c_nrm"),
        )
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("nrm"),
        )
        .join(F.broadcast(cents), how="cross")
        .select(
            "vec_id",
            "vec",
            "nrm",
            "centroid_id",
            (
                _dot(F.col("vec"), F.col("c_vec"))
                / (F.col("nrm") * F.col("c_nrm"))
            ).alias("cent_cos"),
        )
    )
    aw = Window.partitionBy("vec_id").orderBy(
        F.col("cent_cos").desc(), F.col("centroid_id").asc()
    )
    assigned = (
        scored.withColumn("__a", F.row_number().over(aw))
        .filter(F.col("__a") == 1)
        .select("vec_id", "centroid_id", "vec", "nrm")
        # feeds BOTH sides of the pair join and the final left join —
        # cut the assignment pipeline so it is computed once
        .localCheckpoint(eager=False)
    )
    if score == "arrow":
        id_dt = corpus.schema[id_col].dataType.simpleString()
        return _cluster_witness_arrow(assigned, threshold, id_dt)
    if score != "fold":
        raise ValueError(f"score must be fold|arrow, got {score!r}")
    return _cluster_witness_fold(assigned, threshold)


def _cluster_witness_fold(assigned: DataFrame, threshold: float) -> DataFrame:
    """Shared witness stage of the SemDeDup family (semantic_dedup and
    semantic_dedup_kmeans): within-cluster smaller-id pairs above
    ``threshold`` cosine, aggregated to each vector's minimum witness.
    ``assigned`` must carry (vec_id, centroid_id, vec, nrm). The join is
    an EQUI-join on centroid_id (both sides co-partitioned by the cluster
    key); the |cluster|^2 term is the paper's own cost model, bounded by
    the caller's C ∝ N centroid-count rule."""
    x, y = assigned.alias("x"), assigned.alias("y")
    witnesses = (
        x.join(
            y,
            (F.col("x.centroid_id") == F.col("y.centroid_id"))
            & (F.col("y.vec_id") < F.col("x.vec_id")),
        )
        .filter(
            F.round(
                _dot(F.col("x.vec"), F.col("y.vec"))
                / (F.col("x.nrm") * F.col("y.nrm")),
                6,
            )
            > threshold
        )
        .groupBy(F.col("x.vec_id").alias("vec_id"))
        .agg(F.min(F.col("y.vec_id")).alias("dup_of"))
    )
    return (
        assigned.select("vec_id", "centroid_id")
        .join(witnesses, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
        )
    )


def semantic_dedup_kmeans(
    corpus: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    score: str = "fold",
    exact: bool = False,
    seed_hash: str = "xxhash64",
    assign: str = "fold",
) -> DataFrame:
    """SemDeDup with a TRAINED coarse quantizer — the production path the
    paper actually runs (Abbas et al. 2023 cluster with k-means over the
    embedding space), composed from the existing IVF building blocks:
    :func:`stride_codebook` seeds (deterministic hash-ordered sample) ->
    ``iters`` Lloyd iterations (:func:`kmeans_refine_codebook`) -> nearest
    trained centroid assignment -> the same within-cluster witness stage
    as :func:`semantic_dedup`.

    vs ``semantic_dedup``'s smallest-id anchors: trained centroids track
    the DATA's density, so clusters are tighter and near-dup pairs
    co-cluster more reliably (recall invariant pinned in
    tests/test_operators.py).

    ``exact=True`` + ``seed_hash='md5'`` is the hash-checkable form
    (VERDICT r8 item 1): micro-unit exact Lloyd means + an md5-ordered
    seed sample DuckDB can replay, so a SQL oracle can unroll the full
    iteration (the ext_pagerank discipline applied to k-means). The
    defaults keep the cheap production arithmetic.

    ``assign='arrow'`` is the SCALE path for assignment (and
    ``score='arrow'`` for the witness stage): under the paper's C ∝ N
    centroid rule, assignment is O(N·C·dim) flops — inherent to k-means —
    and the r9 32x probe measured the interpreted fold at 75 s where the
    blocked matmul (:func:`_assign_nearest_arrow`) runs the same flops
    vectorized. 'fold' stays the default because it is the bit-exact form
    the oracle replays; deployments at C >= ~10^2 should pass 'arrow' for
    both knobs. Contract difference (ADVICE r9): 'arrow' DROPS rows whose
    vector is NULL/wrong-width/zero-norm (no meaningful assignment), so
    its output can have fewer rows than |corpus|; 'fold' carries them
    through with a NULL-ignoring max_by.

    Scale shape: identical to semantic_dedup — codebook work is
    |V| x C per Lloyd pass with only scalar (centroid, dim, val) triples
    shuffled, assignment is one narrow pass (broadcast-argmax hash agg or
    the matmul kernel — no shuffle either way), and the pair stage is the
    cluster-key equi-join.
    """
    if assign not in ("fold", "arrow"):
        raise ValueError(f"assign must be fold|arrow, got {assign!r}")
    codebook = stride_codebook(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        seed_hash=seed_hash,
    )
    refined = kmeans_refine_codebook(
        corpus,
        codebook,
        id_col=id_col,
        vec_col=vec_col,
        iters=iters,
        exact=exact,
        assign=assign,
    )
    base = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    if assign == "arrow":
        id_dt = corpus.schema[id_col].dataType.simpleString()
        assigned = _assign_nearest_arrow(
            base, refined, id_dt, with_vec=True
        ).localCheckpoint(eager=False)
    else:
        assigned = (
            base.join(F.broadcast(refined), how="cross")
            .select(
                "vec_id",
                "vec",
                "nrm",
                "centroid_id",
                (
                    _dot(F.col("vec"), F.col("cent_vec"))
                    / (F.col("nrm") * F.col("cent_nrm"))
                ).alias("cent_cos"),
            )
            .groupBy("vec_id")
            .agg(
                # argmax cosine, smallest centroid_id on ties — one hash
                # agg, no per-vector window shuffle
                F.max_by(
                    "centroid_id",
                    F.struct(F.col("cent_cos"), -F.col("centroid_id")),
                ).alias("centroid_id"),
                F.first("vec").alias("vec"),
                F.first("nrm").alias("nrm"),
            )
            # feeds both sides of the pair join and the final left join
            .localCheckpoint(eager=False)
        )
    if score == "arrow":
        id_dt = corpus.schema[id_col].dataType.simpleString()
        return _cluster_witness_arrow(assigned, threshold, id_dt)
    if score != "fold":
        raise ValueError(f"score must be fold|arrow, got {score!r}")
    return _cluster_witness_fold(assigned, threshold)


def _cluster_witness_arrow(
    assigned: DataFrame, threshold: float, id_dt: str
) -> DataFrame:
    """semantic_dedup's arrow scorer: one numpy matmul per cluster instead
    of an interpreted fold per pair. Each group is one inverted cluster
    (bounded by the C ∝ N deployment rule); rows sort by id inside the
    kernel so 'first True along the strict lower triangle' IS the minimum
    smaller similar id. Cosines round to 6 before the threshold compare,
    mirroring the fold path's determinism contract (summation order can
    still differ in the last pre-round ulp — equivalence-tested, not
    value-hash-oracled)."""

    def cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        # valid-row mask (the _assign_nearest_arrow/_cell_local_topk
        # guard this kernel was missing, r12 self-review): one NULL,
        # ragged, or zero-norm vector must not np.stack-crash the whole
        # task — such rows are similar to nothing, verdict (False, None)
        lens = pdf["vec"].map(lambda v: -1 if v is None else len(v))
        width = int(lens.max()) if len(lens) else 0
        ok = (
            (lens == width) & pdf["nrm"].notna() & (pdf["nrm"] > 0)
        ).to_numpy()
        sub = pdf[ok]
        n = len(pdf)
        any_hit = np.zeros(n, dtype=bool)
        # object dtype, not Int64: ids may be strings/UUIDs — the module
        # supports arbitrary id types and Arrow casts objects per the
        # declared schema (r12 self-review)
        dup_of = pd.Series([None] * n, dtype="object")
        if len(sub):
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in sub["vec"]]
            )
            nrm = sub["nrm"].to_numpy()
            cos = np.round((V @ V.T) / np.outer(nrm, nrm), 6)
            ids = sub["vec_id"].to_numpy()
            hit = np.tril(cos > threshold, k=-1)  # strict lower: j < i
            sub_hit = hit.any(axis=1)
            first = hit.argmax(axis=1)
            idx = np.flatnonzero(ok)
            any_hit[idx] = sub_hit
            for p, h, j in zip(idx, sub_hit, first):
                if h:
                    dup_of.iloc[p] = ids[j]
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "centroid_id": pdf["centroid_id"],
                "is_dup": any_hit,
                "dup_of": dup_of,
            }
        )

    # centroid_id's type comes from the ASSIGNMENT frame, not the id
    # column: semantic_dedup centroids are anchor ids (id-typed) but the
    # kmeans path numbers them with int row_numbers — declaring id_dt
    # there was an Arrow cast failure for string ids (r12 self-review)
    cent_dt = assigned.schema["centroid_id"].dataType.simpleString()
    return (
        assigned.select("vec_id", "centroid_id", "vec", "nrm")
        .groupBy("centroid_id")
        .applyInPandas(
            cell,
            f"vec_id {id_dt}, centroid_id {cent_dt}, is_dup boolean, "
            f"dup_of {id_dt}",
        )
    )

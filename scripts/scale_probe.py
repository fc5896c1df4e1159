"""Empirical scaling probe: replicate the documents table 1x/2x/4x (each
replica token-tagged so replicas are NOT near-duplicates of each other —
otherwise the pair graph itself grows quadratically and the probe would
measure the data change, not the algorithm) and time the dedup scale paths.

Near-linear growth here is the local-mode evidence for the 100 TB claim:
every measured operator is one or two hash-shuffles whose volume is linear
in the input (shingles, signatures, band buckets), with no all-pairs term.

Usage: python scripts/scale_probe.py [sf_dir] [out_json] [sections]
``sections`` is a comma list of {core,pq,ccdeep,knn} (default all).
Partial runs MERGE into an existing out_json, so one new operator family
can be probed without re-timing the whole suite.
"""

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402


def replicated_docs(spark, sf_dir, factor, base_dir, tag=""):
    """factor copies of documents, re-ided and token-tagged per replica."""
    from ltss_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for i in range(factor):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                # tag every token so replica i shares no shingles with j != i
                F.regexp_replace("text", r"(\S+)", f"$1_r{i}").alias("text"),
                "lang",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    path = os.path.join(base_dir, f"docs{tag}_x{factor}")
    out.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def replicated_states(spark, sf_dir, factor, base_dir, tag=""):
    """factor copies of the canonical state table, entity-tagged per
    replica so segment count (and segment SIZE) grows linearly."""
    from ltss_spark.ingest import states_from_events
    from ltss_spark.sources.batch import load_table

    states = states_from_events(load_table(spark, sf_dir, "events")).select(
        "time", "entity_id", "state", "attributes"
    )
    parts = [
        states.withColumn("entity_id", F.concat("entity_id", F.lit(f"_r{i}")))
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    path = os.path.join(base_dir, f"states{tag}_x{factor}")
    out.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def replicated_embeddings(spark, sf_dir, factor, base_dir, tag=""):
    """factor re-ided copies of embeddings. Identical vectors are fine for
    the top-k probes: the query set is FIXED, so candidate volume grows
    linearly with the corpus regardless of inter-replica similarity."""
    from ltss_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = [
        emb.select((F.col("vec_id") + F.lit(i * n)).alias("vec_id"), "embedding")
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    path = os.path.join(base_dir, f"emb{tag}_x{factor}")
    out.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def replicated_embeddings_shifted(spark, sf_dir, factor, base_dir, tag=""):
    """factor re-ided copies of embeddings, each replica's vectors
    circular-shifted by i positions. Shifting DECORRELATES exact copies
    (no identical twins across replicas) but the fixture's weakly-
    clustered vectors remain partially correlated under rotation, so the
    TRUE pair set still grows super-linearly with factor (measured ~29x
    over 8x at threshold 0.3 — see docs/SCALING.md). The probe's honest
    metric for this operator is therefore seconds PER EMITTED PAIR
    (output-bound floor), not raw seconds: any correct algorithm must pay
    for the answer it returns."""
    from ltss_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = []
    for i in range(factor):
        shifted = F.concat(
            F.slice("embedding", i + 1, 64 - i), F.slice("embedding", 1, i)
        ) if i else F.col("embedding")
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
                shifted.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    path = os.path.join(base_dir, f"embsh{tag}_x{factor}")
    out.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "scale_probe.json"
    sections = set((sys.argv[3] if len(sys.argv) > 3 else "all").split(","))

    def want(name: str) -> bool:
        return "all" in sections or name in sections

    from pyspark.sql import SparkSession

    from ltss_spark.operators.compress import compress_states
    from ltss_spark.operators.corpus import repetition_stats
    from ltss_spark.operators.dedup import exact_dedup_groups, minhash_lsh_pairs
    from ltss_spark.operators.graph import connected_components
    from ltss_spark.operators.similarity import (
        cosine_topk_lsh,
        embedding_dup_pairs,
        pq_codebooks,
        pq_encode,
    )
    from ltss_spark.sources.batch import upsert_partitioned, write_partitioned
    from ltss_spark.session import pin_session_for_oracle

    # State API v2 protobuf shim must be wired BEFORE the JVM starts
    # (local-mode workers inherit the env captured at JVM launch) — the
    # twsooo probe runs a real transformWithStateInPandas stream
    from ltss_spark.streaming.stateful import enable_state_api_v2_runtime

    enable_state_api_v2_runtime()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pin_session_for_oracle(spark)

    def timed(fn):
        """min of 2 runs — strips stragglers; result of the first run."""
        t = time.time()
        out = fn()
        d1 = time.time() - t
        t = time.time()
        fn()
        return out, round(min(d1, time.time() - t), 2)

    base = os.path.join(tempfile.gettempdir(), f"scale_probe_{uuid.uuid4().hex}")
    # replica tables are GBs at the deep factors — remove them however the
    # probe exits (a leaked base dir per run was measured at ~100 MB each)
    import atexit
    import shutil

    atexit.register(shutil.rmtree, base, ignore_errors=True)
    results = {"sf_dir": sf_dir}
    if want("core"):
        results["factors"] = {}
    # warm/fixed copies live under their own paths: the factor loop
    # re-writes <name>_x1 with overwrite, which would delete the files the
    # still-lazy warm plans (probe_q!) reference
    warm = replicated_docs(spark, sf_dir, 1, base, tag="_warm")
    # untimed warmup: JVM/codegen/broadcast machinery out of the 1x numbers
    minhash_lsh_pairs(warm).count()
    connected_components(minhash_lsh_pairs(warm), small_graph_edges=0).count()
    exact_dedup_groups(warm).count()
    repetition_stats(warm).count()

    # fixed across factors: the probe queries and the PQ codebooks (trained
    # once — codebook size does not grow with the corpus)
    emb1 = replicated_embeddings(spark, sf_dir, 1, base, tag="_warm")
    probe_q = emb1.filter(F.col("vec_id") < 3)
    books = pq_codebooks(emb1)
    states1 = replicated_states(spark, sf_dir, 1, base, tag="_warm")
    compress_states(states1, value_cols=("state",)).count()
    cosine_topk_lsh(emb1, probe_q).count()
    pq_encode(emb1, books).count()
    embedding_dup_pairs(emb1, threshold=0.3, method="lsh", dim=64).count()

    from ltss_spark.operators.cagg import refresh_rollup
    from ltss_spark.operators.dedup import duplicate_span_stats
    from ltss_spark.operators.geo import bbox_spatial_join
    from ltss_spark.operators.text import tfidf_topk
    from ltss_spark.operators.timeseries import sessionize

    def synth_boxes():
        rows = [
            (
                b,
                float((b * 29) % 300 - 160),
                float((b * 17) % 120 - 70),
                float((b * 29) % 300 - 160 + 24),
                float((b * 17) % 120 - 70 + 18),
            )
            for b in range(25)
        ]
        return spark.createDataFrame(
            rows, "box_id long, west double, south double, east double, north double"
        )

    boxes = synth_boxes()

    def points_of(emb):
        return emb.select(
            F.col("vec_id").alias("pid"),
            ((F.col("vec_id") % 360).cast("double") - 180.0 + 0.5).alias("lon"),
            (((F.col("vec_id") * 7) % 178).cast("double") - 89.0 + 0.25).alias("lat"),
        )

    def cagg_agg(src):
        return src.groupBy("bucket", "entity_id").agg(F.count(F.lit(1)).alias("n"))

    sessionize(states1, time_col="time", key_cols=("entity_id",), tie_breaker=None).count()
    bbox_spatial_join(points_of(emb1), boxes).count()
    tfidf_topk(warm).count()

    for factor in (1, 2, 4, 8) if want("core") else ():
        docs = replicated_docs(spark, sf_dir, factor, base)
        row = {"n_docs": docs.count()}
        row["minhash_pairs"], row["minhash_sec"] = timed(
            lambda: minhash_lsh_pairs(docs).count()
        )
        cc_stats: dict = {}
        row["cc_components"], row["cc_sec"] = timed(
            # small_graph_edges=0: the probe charts the DISTRIBUTED star loop
            lambda: connected_components(
                minhash_lsh_pairs(docs), stats=cc_stats, small_graph_edges=0
            ).count()
        )
        row["cc_rounds"] = cc_stats.get("rounds")
        row["exact_groups"], row["exact_sec"] = timed(
            lambda: exact_dedup_groups(docs).count()
        )
        row["repetition_rows"], row["repetition_sec"] = timed(
            lambda: repetition_stats(docs).count()
        )
        states = replicated_states(spark, sf_dir, factor, base)
        row["compress_segments"], row["compress_sec"] = timed(
            lambda: compress_states(states, value_cols=("state",)).count()
        )
        emb = replicated_embeddings(spark, sf_dir, factor, base)
        row["lsh_topk_rows"], row["lsh_topk_sec"] = timed(
            lambda: cosine_topk_lsh(emb, probe_q).count()
        )
        row["pq_encoded_rows"], row["pq_encode_sec"] = timed(
            lambda: pq_encode(emb, books).count()
        )
        # round-3 operators: per-key window (sessionize), grid-bucketed
        # spatial equi-join, tfidf double aggregation — all linear shapes
        row["sessions"], row["sessionize_sec"] = timed(
            lambda: sessionize(
                states, time_col="time", key_cols=("entity_id",), tie_breaker=None
            ).count()
        )
        # round-5 ops: interval-split uptime (explode ∝ output rows) and
        # the shard-partitioned shuffle (one hash exchange, no global sort)
        from ltss_spark.operators.corpus import shuffle_shard
        from ltss_spark.operators.timeseries import time_in_state_bucketed

        row["uptime_rows"], row["uptime_sec"] = timed(
            lambda: time_in_state_bucketed(states, unit="day").count()
        )
        row["shard_rows"], row["shuffle_shard_sec"] = timed(
            lambda: shuffle_shard(docs).count()
        )
        row["bbox_matches"], row["bbox_join_sec"] = timed(
            lambda: bbox_spatial_join(points_of(emb), boxes).count()
        )
        row["tfidf_rows"], row["tfidf_sec"] = timed(lambda: tfidf_topk(docs).count())
        # substring-dedup audit: replicas share no grams (token tagging),
        # so this measures the positional window + df machinery's pure
        # linear cost, not a growing dup graph
        row["span_rows"], row["span_audit_sec"] = timed(
            lambda: duplicate_span_stats(docs).count()
        )
        # round-4 (VERDICT r3 item 7a): the embed-dedup LSH path now
        # REGISTERED by ext_dedup_embed. Replicas are shift-decorrelated
        # (linear true-pair growth); bits scale with density — one extra
        # sign bit per data doubling keeps expected bucket occupancy
        # constant, which is the knob a 100 TB deployment turns (candidate
        # volume ~ tables * n^2 / 2^bits; fixed bits would be quadratic BY
        # DESIGN, not an implementation flaw). Recall per table drops with
        # bits; production compensates with more tables — held fixed here
        # so the timed work stays comparable.
        import math

        embsh = replicated_embeddings_shifted(spark, sf_dir, factor, base)
        bits = 4 + int(math.log2(factor))
        row["embed_dedup_pairs"], row["embed_dedup_sec"] = timed(
            lambda: embedding_dup_pairs(
                embsh, threshold=0.3, method="lsh", bits=bits, dim=64
            ).count()
        )
        # round-5 (VERDICT r4 item 2): the same LSH path with the
        # pair-materialization guard. The uncapped TRUE pair set grows
        # ~n^1.6 on this corpus (data density, not a plan defect); the
        # top-5-per-endpoint cap must hold the OUTPUT at <= 10 pairs per
        # vector at every factor — the bound that keeps the write-out
        # linear at 100 TB however dense the corpus gets.
        n_vecs = embsh.count()
        row["embed_capped_pairs"], row["embed_capped_sec"] = timed(
            lambda: embedding_dup_pairs(
                embsh, threshold=0.3, method="lsh", bits=bits, dim=64,
                max_pairs_per_vector=5,
            ).count()
        )
        row["embed_capped_pairs_per_vec"] = round(
            row["embed_capped_pairs"] / max(n_vecs, 1), 3
        )
        # round-4 (item 7b): the PK-upsert sink. Base table = this factor's
        # states; the update slice is ONE fixed day re-delivered — the
        # micro-batch shape. Cost must track the touched months' data
        # (linear here: month size grows with factor), never total history.
        up_dir = os.path.join(base, f"upsert_x{factor}")
        write_partitioned(states, up_dir)
        upd = states.filter(F.dayofmonth("time") == 15)
        t0 = time.time()
        upsert_partitioned(spark, up_dir, upd, pk=("time", "entity_id"),
                           tie_breaker=None)
        row["upsert_sec"] = round(time.time() - t0, 2)
        row["upsert_rows"] = upd.count()
        # round-5: CDC apply onto a 256-bucket hash-partitioned target.
        # The timed batch is a FIXED key set (a hash slice of replica-0
        # entities, constant across factors, every 7th change a DELETE):
        # the rewrite must touch only the buckets those keys hash into —
        # a factor-INDEPENDENT bucket count — while each touched bucket
        # grows ∝ table/256. Cost ∝ touched share, never the table; the
        # touched-bucket count printed alongside is the proof.
        from ltss_spark.operators.cdc import cdc_apply

        cdc_dir = os.path.join(base, f"cdc_x{factor}")
        cdc_base = states.select(
            "entity_id",
            "state",
            F.unix_micros("time").alias("version"),
            F.lit("U").alias("op"),
        )
        cdc_apply(spark, cdc_dir, cdc_base, pk=("entity_id",), n_buckets=256)
        batch = (
            cdc_base.filter(
                F.col("entity_id").endswith("_r0")
                & (F.pmod(F.xxhash64("entity_id"), F.lit(40)) == 0)
            )
            .withColumn("version", F.col("version") + 1)
            .withColumn(
                "op",
                F.when(F.pmod(F.col("version"), F.lit(7)) == 0, "D").otherwise("U"),
            )
        )
        t0 = time.time()
        touched = cdc_apply(spark, cdc_dir, batch, pk=("entity_id",), n_buckets=256)
        row["cdc_sec"] = round(time.time() - t0, 2)
        row["cdc_buckets_touched"] = len(touched)
        # round-5: vocabulary build + tokenize-to-ids. Token tagging makes
        # the DISTINCT token universe grow with factor while the top-1000
        # vocab stays constant-size — the explode and the broadcast encode
        # are the linear costs, the ranking window stays |tokens|-bounded.
        from ltss_spark.operators.corpus import vocab_encode

        row["vocab_rows"], row["vocab_sec"] = timed(
            lambda: vocab_encode(docs).count()
        )
        # cagg: full rebuild vs single-stale-day refresh — refresh must
        # track the CHANGED slice (1/30th of the days), not the table
        cagg_dir = os.path.join(base, f"cagg_x{factor}")
        v1 = states.filter(F.dayofmonth("time") != 15)
        t0 = time.time()
        refresh_rollup(spark, v1, cagg_dir, cagg_agg, time_col="time", unit="day",
                       sig_cols=["entity_id", "state"])
        row["cagg_build_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        stale = refresh_rollup(spark, states, cagg_dir, cagg_agg, time_col="time",
                               unit="day", sig_cols=["entity_id", "state"])
        row["cagg_refresh_sec"] = round(time.time() - t0, 2)
        row["cagg_stale_days"] = len(stale)
        results["factors"][str(factor)] = row
        print(json.dumps({factor: row}))

    # PQ probe-count scaling: the broadcast-LUT rewrite's claim is that
    # plan size and driver work are CONSTANT in |queries| (the per-query
    # union-leg implementation grew linearly and choked at a few thousand
    # probes). Fixed corpus, 3 -> 192 probes: wall time should grow far
    # slower than |queries| (one scan, broadcast probe frame), and the 64x
    # probe sweep must simply complete — the old shape timed out building
    # the plan.
    from ltss_spark.operators.similarity import cosine_topk_pq

    if want("pq"):
        results["pq_query_scaling"] = {}
        cosine_topk_pq(emb1, probe_q).count()  # warm encode path
        for nq in (3, 12, 48, 192):
            qs = emb1.filter(F.col("vec_id") < nq)
            _, sec = timed(lambda: cosine_topk_pq(emb1, qs).count())
            results["pq_query_scaling"][str(nq)] = sec
            print(json.dumps({"pq_queries": nq, "sec": sec}))

    # round-5 (VERDICT r4 item 6): connected components two more doublings.
    # CC is the one ITERATIVE operator, so its scale hazard is round count,
    # not per-round volume — large/small-star converges in O(log^2 n)
    # alternations, and this chart is the empirical check that rounds grow
    # logarithmically (flat-ish) while seconds stay ~linear in the edge
    # volume, 1x-32x. Pairs come from the same token-tagged replication as
    # the main loop (replicas share no shingles), so the component
    # STRUCTURE is constant per replica and only the graph SIZE grows.
    if want("ccdeep"):
        results["cc_deep_scaling"] = {}
    for factor in (16, 32) if want("ccdeep") else ():
        docs = replicated_docs(spark, sf_dir, factor, base)
        pairs = minhash_lsh_pairs(docs)
        cc_stats = {}
        comps, sec = timed(
            lambda: connected_components(
                pairs, stats=cc_stats, small_graph_edges=0
            ).count()
        )
        results["cc_deep_scaling"][str(factor)] = {
            "n_docs": docs.count(),
            "cc_components": comps,
            "cc_sec": sec,
            "cc_rounds": cc_stats.get("rounds"),
        }
        print(json.dumps({factor: results["cc_deep_scaling"][str(factor)]}))

    # round-7 (VERDICT r6 item 7): the kNN-join family. Two claims:
    # (a) THROUGHPUT — with the FAISS deployment rule C ∝ N (constant
    #     average inverted-list size, nprobe fixed) the per-vector candidate
    #     count is constant, so total work grows linearly in N. Replicas are
    #     shift-decorrelated (same fixture as embed-dedup) so the true
    #     neighbor structure doesn't collapse across replicas.
    # (b) RECALL — on the fixed 1x corpus, recall@k vs the exact brute-force
    #     baseline rises with nprobe and reaches 1.0 at nprobe == C (the
    #     candidate set is then the whole corpus by construction).
    from ltss_spark.operators.similarity import knn_join

    if want("knn"):
        results["knn_scaling"] = {}
        knn_join(emb1, k=5, method="ivf", n_centroids=16, nprobe=4).count()  # warm
        for factor in (1, 2, 4, 8):
            embsh = replicated_embeddings_shifted(spark, sf_dir, factor, base)
            n = embsh.count()
            c = max(16, n // 125)  # hold avg cell ≈ 125 vectors
            rows, sec = timed(
                lambda: knn_join(
                    embsh, k=5, method="ivf", n_centroids=c, nprobe=4
                ).count()
            )
            results["knn_scaling"][str(factor)] = {
                "n_vecs": n,
                "n_centroids": c,
                "knn_rows": rows,
                "knn_sec": sec,
            }
            print(json.dumps({factor: results["knn_scaling"][str(factor)]}))

        exact = (
            knn_join(emb1, k=5, method="exact")
            .select("vec_id", "neighbor_id")
            .localCheckpoint()
        )
        n_exact = exact.count()
        results["knn_recall_vs_nprobe"] = {}
        for nprobe in (1, 2, 4, 8, 16):
            ivf = knn_join(
                emb1, k=5, method="ivf", n_centroids=16, nprobe=nprobe
            ).select("vec_id", "neighbor_id")
            hit = ivf.join(exact, ["vec_id", "neighbor_id"], "left_semi").count()
            results["knn_recall_vs_nprobe"][str(nprobe)] = round(hit / n_exact, 4)
            print(json.dumps({"nprobe": nprobe, "recall@5": hit / n_exact}))

    # round-7 operators: each claims a linear scale shape — measured here.
    # - token_budget_mix: projection + |sources| agg + per-source cumsum
    # - cluster_balance / semantic_dedup: anchors scale C ∝ N (constant
    #   cluster size), so assignment and within-cluster pair work are
    #   both ∝ N by construction
    # - distributed_row_number: range exchange + partitioned window —
    #   the replacement for the single-reducer global rank
    # - hybrid_rrf: fusion input is CONSTANT (k+k rows); the timed cost
    #   is the two retrievers, each linear
    if want("r7ops"):
        from ltss_spark.operators.corpus import token_budget_mix
        from ltss_spark.operators.rank import distributed_row_number
        from ltss_spark.operators.similarity import (
            cluster_balance,
            cosine_topk,
            semantic_dedup,
        )
        from ltss_spark.operators.text import bm25_topk, hybrid_rrf

        results["r7_scaling"] = {}
        token_budget_mix(warm, source_col="lang").count()  # warm
        cluster_balance(emb1).count()
        for factor in (1, 2, 4, 8):
            docs = replicated_docs(spark, sf_dir, factor, base)
            embsh = replicated_embeddings_shifted(spark, sf_dir, factor, base)
            n = embsh.count()
            c = max(8, n // 125)
            row = {"n_docs": docs.count(), "n_vecs": n, "n_centroids": c}
            row["mix_rows"], row["mix_sec"] = timed(
                lambda: token_budget_mix(docs, source_col="lang").count()
            )
            row["cbal_rows"], row["cbal_sec"] = timed(
                lambda: cluster_balance(embsh, n_centroids=c).count()
            )
            row["semdedup_rows"], row["semdedup_sec"] = timed(
                lambda: semantic_dedup(embsh, n_centroids=c).count()
            )
            _, row["semdedup_arrow_sec"] = timed(
                lambda: semantic_dedup(
                    embsh, n_centroids=c, score="arrow"
                ).count()
            )
            row["rank_rows"], row["rank_sec"] = timed(
                lambda: distributed_row_number(
                    docs.select(
                        "doc_id", F.length("text").cast("long").alias("score")
                    ),
                    [F.col("score").desc(), F.col("doc_id").asc()],
                ).count()
            )

            def _hybrid():
                lex = bm25_topk(
                    docs, ["hash", "join", "vector"], k=25
                ).select("doc_id", "rank")
                den = cosine_topk(
                    embsh, embsh.filter(F.col("vec_id") == 0), k=25
                ).select(F.col("candidate_id").alias("doc_id"), "rank")
                return hybrid_rrf(lex, den, k=10).count()

            row["hybrid_rows"], row["hybrid_sec"] = timed(_hybrid)
            # late-r7 ops over the replicated state/event tables:
            # - seasonal_anomaly: one hash agg to |keys| x 24 + broadcast
            # - interval_overlap_join: shuffle ∝ interval-days
            from ltss_spark.operators.timeseries import (
                interval_overlap_join,
                seasonal_anomaly,
            )

            states = replicated_states(spark, sf_dir, factor, base)
            ev = states.select(
                F.monotonically_increasing_id().alias("event_id"),
                F.col("entity_id").alias("user_id"),
                F.col("time").alias("ts"),
                F.coalesce(
                    F.expr("try_cast(state AS DOUBLE)"), F.lit(0.0)
                ).alias("value"),
            )
            row["anomaly_rows"], row["anomaly_sec"] = timed(
                lambda: seasonal_anomaly(ev).count()
            )
            wspec = Window.partitionBy("entity_id").orderBy("time")
            iv = states.select(
                "entity_id",
                F.col("time").alias("i_start"),
                F.lead("time").over(wspec).alias("i_end"),
            ).filter(F.col("i_end") > F.col("i_start"))
            wins = states.select(
                (F.date_trunc("day", "time") + F.expr("INTERVAL 2 HOUR")).alias("w_start"),
                (F.date_trunc("day", "time") + F.expr("INTERVAL 3 HOUR")).alias("w_end"),
            ).distinct()
            row["ivjoin_rows"], row["ivjoin_sec"] = timed(
                lambda: interval_overlap_join(
                    iv, wins, l_start="i_start", l_end="i_end"
                ).count()
            )
            results["r7_scaling"][str(factor)] = row
            print(json.dumps({factor: row}))

    # round-8 operators (VERDICT r7 follow-through): each new op probed
    # 1x-8x on replicated fixtures.
    # - perplexity_buckets: bigram-LM scoring is linear in token volume;
    #   the global rank is distributed_row_number (two-pass above its
    #   threshold) — expect ~linear seconds, never a reducer blowup.
    # - semantic_dedup_kmeans: same C ∝ N rule as semantic_dedup — with
    #   constant cluster size the per-vector work is constant; Lloyd
    #   passes shuffle only (centroid, dim, val) scalars.
    # - cusum_changepoints: one window shuffle per series; series count
    #   grows with the replica tag, so expect ~linear.
    if want("r8"):
        from ltss_spark.operators.dedup import minhash_verified_pairs
        from ltss_spark.operators.graph import pagerank
        from ltss_spark.operators.similarity import semantic_dedup_kmeans
        from ltss_spark.operators.text import perplexity_buckets
        from ltss_spark.operators.timeseries import (
            cusum_changepoints,
            m4_downsample,
        )

        results["r8_scaling"] = {}
        perplexity_buckets(warm).count()  # warm
        for factor in (1, 2, 4, 8):
            docs = replicated_docs(spark, sf_dir, factor, base)
            embsh = replicated_embeddings_shifted(spark, sf_dir, factor, base)
            n = embsh.count()
            c = max(8, n // 125)
            row = {"n_docs": docs.count(), "n_vecs": n, "n_centroids": c}
            row["ppl_rows"], row["ppl_sec"] = timed(
                lambda: perplexity_buckets(docs).count()
            )
            row["semkm_rows"], row["semkm_sec"] = timed(
                lambda: semantic_dedup_kmeans(embsh, n_centroids=c).count()
            )
            states = replicated_states(spark, sf_dir, factor, base)
            ev = states.select(
                F.monotonically_increasing_id().alias("event_id"),
                F.col("entity_id").alias("user_id"),
                F.col("time").alias("ts"),
                F.coalesce(
                    F.expr("try_cast(state AS DOUBLE)"), F.lit(1.0)
                ).alias("value"),
            )
            row["cusum_rows"], row["cusum_sec"] = timed(
                lambda: cusum_changepoints(ev).count()
            )
            row["m4_rows"], row["m4_sec"] = timed(
                lambda: m4_downsample(ev).count()
            )
            row["mhv_rows"], row["mhv_sec"] = timed(
                lambda: minhash_verified_pairs(docs).count()
            )
            row["pr_rows"], row["pr_sec"] = timed(
                lambda: pagerank(minhash_lsh_pairs(docs)).count()
            )
            results["r8_scaling"][str(factor)] = row
            print(json.dumps({factor: row}))

    # round-9 deep probe (VERDICT r8 item 4): the five r8 operators that
    # claim flat-or-linear shapes, pushed from the 8x ceiling to the same
    # 32x bar cc_deep_scaling met. Factors 1/4/16/32; the honest metric is
    # seconds per input row (flat-or-better = the shape claim holds).
    # - perplexity_buckets / cusum / m4: linear token/event volume
    # - semantic_dedup_kmeans, two shipped shapes: the REGISTERED
    #   exact+md5+fold form at its registered FIXED C=8 (O(N) — the
    #   oracle-replayable entry), and the PRODUCTION arrow form at the
    #   paper's C ∝ N rule (O(N·C·dim) flops, vectorized). The first r9
    #   probe ran the interpreted fold at C ∝ N and measured 75 s at 32x
    #   — k-means assignment flops are inherent, interpreting them per
    #   pair is not; the arrow kernel replaced that path (docs/SCALING.md)
    # - pagerank: fixed 5 rounds over the near-dup graph; nodes/edges
    #   grow linearly with the tagged replicas
    if want("r9"):
        from ltss_spark.operators.graph import pagerank
        from ltss_spark.operators.similarity import semantic_dedup_kmeans
        from ltss_spark.operators.text import perplexity_buckets
        from ltss_spark.operators.timeseries import (
            cusum_changepoints,
            m4_downsample,
        )

        results["r9_scaling"] = {}
        perplexity_buckets(warm).count()  # warm
        for factor in (1, 4, 16, 32):
            docs = replicated_docs(spark, sf_dir, factor, base)
            embsh = replicated_embeddings_shifted(spark, sf_dir, factor, base)
            n = embsh.count()
            c = max(8, n // 125)
            row = {"n_docs": docs.count(), "n_vecs": n, "n_centroids": c}
            row["ppl_rows"], row["ppl_sec"] = timed(
                lambda: perplexity_buckets(docs).count()
            )
            row["semkm_exact_rows"], row["semkm_exact_sec"] = timed(
                lambda: semantic_dedup_kmeans(
                    embsh, n_centroids=8, exact=True, seed_hash="md5"
                ).count()
            )
            row["semkm_arrow_rows"], row["semkm_arrow_sec"] = timed(
                lambda: semantic_dedup_kmeans(
                    embsh, n_centroids=c, assign="arrow", score="arrow"
                ).count()
            )
            states = replicated_states(spark, sf_dir, factor, base)
            ev = states.select(
                F.monotonically_increasing_id().alias("event_id"),
                F.col("entity_id").alias("user_id"),
                F.col("time").alias("ts"),
                F.coalesce(
                    F.expr("try_cast(state AS DOUBLE)"), F.lit(1.0)
                ).alias("value"),
            )
            row["cusum_rows"], row["cusum_sec"] = timed(
                lambda: cusum_changepoints(ev).count()
            )
            row["m4_rows"], row["m4_sec"] = timed(
                lambda: m4_downsample(ev).count()
            )
            row["pr_rows"], row["pr_sec"] = timed(
                lambda: pagerank(minhash_lsh_pairs(docs)).count()
            )
            results["r9_scaling"][str(factor)] = row
            print(json.dumps({factor: row}))

    # round-9 skew-guard probe: a corpus-global hot token (20 copies
    # appended to every doc ≈ 28% of all occurrences) drives the token
    # join's hottest key past hot_key_guarded_join's DEFAULT thresholds
    # as the corpus grows — at 4x the hot key is ~400k rows (< the 2M
    # floor: plain join, salting would be pure overhead), at 32x it is
    # ~3.2M (auto-salted). The probe records which path fired, that both
    # paths produce identical results (count + micro-unit checksum), and
    # the wall time of each — the guard's whole contract, measured at
    # the size where it matters.
    if want("r9skew"):
        from ltss_spark.operators.text import unigram_logprob

        results["r9_skew_guard"] = {}
        # untimed warmup: the tokenize+agg pipeline's codegen/JIT must not
        # land on the FIRST timed variant (measured: it inflated the 4x
        # auto run ~1.6x vs plain purely by running first)
        unigram_logprob(warm).count()
        for factor in (4, 16, 32):
            docs = replicated_docs(spark, sf_dir, factor, base)
            hot = docs.select(
                "doc_id",
                F.concat(F.col("text"), F.lit(" hot" * 20)).alias("text"),
            )

            def checksum(df):
                r = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("n_tokens").alias("toks"),
                    F.sum(
                        F.round(F.col("avg_logprob") * 1e6, 0).cast("long")
                    ).alias("chk"),
                ).collect()[0]
                return (r["n"], r["toks"], r["chk"])

            dec_auto, dec_plain, dec_forced = {}, {}, {}
            cs_auto, t_auto = timed(
                lambda: checksum(
                    unigram_logprob(hot, skew_decision=dec_auto)
                )
            )
            cs_plain, t_plain = timed(
                lambda: checksum(
                    unigram_logprob(
                        hot,
                        min_hot_rows=1 << 62,  # force the plain join
                        skew_decision=dec_plain,
                    )
                )
            )
            # force the SALTED path regardless of thresholds: the direct
            # measurement of what salting costs/buys at this factor (the
            # "does salting ever win on local[32]" receipt VERDICT r9
            # item 3 asks for)
            cs_forced, t_forced = timed(
                lambda: checksum(
                    unigram_logprob(
                        hot,
                        min_hot_rows=0,
                        skew_decision=dec_forced,
                    )
                )
            )
            assert cs_auto == cs_plain == cs_forced, (
                factor, cs_auto, cs_plain, cs_forced,
            )
            row = {
                "n_docs": hot.count(),
                "hot_rows": dec_auto["max_key_rows"],
                "auto_salted": dec_auto["salted"],
                "forced_salted": dec_forced["salted"],
                "auto_sec": t_auto,
                "plain_sec": t_plain,
                "forced_salted_sec": t_forced,
                "results_identical": True,
                # min-of-2 timing: run 2 hits the pre-flight stats cache,
                # so auto_sec measures the guard at its steady-state cost
                "timing": "min-of-2 (second run = pre-flight cache hit)",
            }
            results["r9_skew_guard"][str(factor)] = row
            print(json.dumps({factor: row}))

    # round-10 probe (VERDICT r9 item 5): ext_perplexity_buckets at 64x —
    # the steepest curve in r9_scaling (2.41 s @1x -> 9.30 s @32x). Split
    # the cost into its two stages to name the dominant one:
    # - scoring (bigram_logprob: tokenize -> two hash aggs -> skew-guarded
    #   join -> per-doc exact-decimal agg) — linear in token volume;
    # - global rank (distributed_row_number) — ADAPTIVE: at 64x the scored
    #   frame is only |docs| rows (320k), BELOW the 1M single-task
    #   threshold, so the default path is the bounded single window (the
    #   scale rule permits one reducer over a bounded set); the probe also
    #   FORCES the two-pass range-partitioned path to show it works and
    #   stays parallel at this size (the "multi-reducer at 64x" receipt —
    #   what actually guards 100 TB is the threshold crossing, measured
    #   here both ways).
    if want("perp64"):
        from ltss_spark.operators.rank import distributed_row_number
        from ltss_spark.operators.text import bigram_logprob, perplexity_buckets

        results["r10_perp64"] = {}
        perplexity_buckets(warm).count()  # warm
        for factor in (32, 64):
            docs = replicated_docs(spark, sf_dir, factor, base)
            row = {"n_docs": docs.count()}
            row["full_rows"], row["full_sec"] = timed(
                lambda: perplexity_buckets(docs).count()
            )
            scored = bigram_logprob(docs).select("doc_id", "ppl")
            row["score_rows"], row["score_sec"] = timed(lambda: scored.count())
            order = [F.col("ppl").asc(), F.col("doc_id").asc()]
            base_scored = scored.localCheckpoint()  # isolate the rank stage
            row["rank_default_rows"], row["rank_default_sec"] = timed(
                lambda: distributed_row_number(base_scored, order).count()
            )
            row["rank_twopass_rows"], row["rank_twopass_sec"] = timed(
                lambda: distributed_row_number(
                    base_scored, order, single_task_threshold=0
                ).count()
            )
            results["r10_perp64"][str(factor)] = row
            print(json.dumps({factor: row}))

    # round-10 probe: ext_bpe_train scaling. BPE's per-merge cost is
    # one explode + one hash agg over the WORD DICTIONARY, so the axis
    # that matters is vocabulary size, not corpus rows. Replicas are
    # letter-tagged (token -> token + 'q' + <letter_i>: stays [a-z]+, so
    # the training filter keeps them) — vocabulary grows ~linearly with
    # the factor while the merge loop's iteration count stays fixed.
    if want("bpe"):
        from ltss_spark.operators.text import bpe_train_merges
        from ltss_spark.sources.batch import load_table

        results["r10_bpe"] = {}
        docs1 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        # small_dict_rows=0: this probe times the DISTRIBUTED merge loop
        # (the 100 TB path) — the r11 adaptive dictionary replay would
        # otherwise short-circuit every factor here
        bpe_train_merges(docs1, n_merges=2, small_dict_rows=0).count()  # warm
        for factor in (1, 4, 16):
            n0 = docs1.agg(F.max("doc_id")).collect()[0][0] + 1
            parts = [
                docs1.select(
                    (F.col("doc_id") + F.lit(i * n0)).alias("doc_id"),
                    F.regexp_replace(
                        "text", r"(\S+)", f"$1q{chr(ord('a') + i)}"
                    ).alias("text"),
                )
                for i in range(factor)
            ]
            rep = parts[0]
            for p in parts[1:]:
                rep = rep.union(p)
            path = os.path.join(base, f"bpe_docs_x{factor}")
            rep.repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(path)
            docs = spark.read.parquet(path)
            vocab = (
                docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
                .filter(F.col("w").rlike("^[a-z]+$"))
                .distinct()
                .count()
            )
            row = {"n_docs": docs.count(), "vocab": vocab}
            row["n_merges"], row["sec"] = timed(
                lambda: bpe_train_merges(
                    docs, n_merges=8, small_dict_rows=0
                ).count()
            )
            results["r10_bpe"][str(factor)] = row
            print(json.dumps({factor: row}))

    # round-10 probe: NB classification + PMI collocations. The replica
    # token-tagging grows the VOCABULARY linearly with the factor (each
    # replica's tokens are disjoint), which is exactly the axis that
    # stresses both operators: nb_score's broadcast model is O(V x C)
    # rows, and pmi's two vocabulary joins broadcast the unigram table.
    # Expected shape: near-linear in token volume (explode + hash aggs +
    # broadcast joins — no all-pairs term anywhere); the probe records
    # the model row count so the broadcast-threshold story is a number,
    # not a claim.
    if want("nbpmi"):
        from ltss_spark.operators.ml import nb_score, nb_train
        from ltss_spark.operators.text import pmi_collocations

        results["r10_nbpmi"] = {}
        nb_score(warm).count()  # warm
        pmi_collocations(warm).count()
        for factor in (1, 4, 16, 32):
            docs = replicated_docs(spark, sf_dir, factor, base)
            row = {"n_docs": docs.count()}
            row["model_rows"], row["nb_train_sec"] = timed(
                lambda: nb_train(docs).count()
            )
            row["nb_score_rows"], row["nb_score_sec"] = timed(
                lambda: nb_score(docs).count()
            )
            row["nb_guarded_rows"], row["nb_guarded_sec"] = timed(
                lambda: nb_score(docs, broadcast_model=False).count()
            )
            row["pmi_rows"], row["pmi_sec"] = timed(
                lambda: pmi_collocations(docs).count()
            )
            results["r10_nbpmi"][str(factor)] = row
            print(json.dumps({factor: row}))

    # round-10 probe: the flagship dedup path at 64x — one factor beyond
    # every prior dedup probe. Two questions: (a) do the pair-generation
    # shapes stay linear one more doubling out (MinHash banded equi-join,
    # SimHash bit-band join, n-gram shingle join, exact md5 groups, and
    # the large/small-star CC loop on the MinHash pairs); (b) does the
    # STATIC band-self-join plan stay sane as the checkpointed signature
    # frame's estimate grows (the audit_broadcast_sides triage notes these
    # joins build a checkpointed |docs|-scale frame at SMALL scale — the
    # healthy behavior is a flip to SMJ well before the build side gets
    # heavy, measured here rather than assumed).
    if want("dedup64"):
        from ltss_spark.operators.dedup import (
            exact_dedup_groups,
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            simhash_pairs,
        )
        from ltss_spark.operators.graph import connected_components

        results["r10_dedup64"] = {}
        for factor in (32, 64):
            docs = replicated_docs(spark, sf_dir, factor, base)
            row = {"n_docs": docs.count()}
            mh = minhash_lsh_pairs(docs)
            row["minhash_pairs"], row["minhash_sec"] = timed(lambda: mh.count())
            cc_stats: dict = {}
            row["cc_components"], row["cc_sec"] = timed(
                lambda: connected_components(
                    minhash_lsh_pairs(docs), stats=cc_stats, small_graph_edges=0
                ).count()
            )
            row["cc_rounds"] = cc_stats.get("rounds")
            row["simhash_pairs"], row["simhash_sec"] = timed(
                lambda: simhash_pairs(docs).count()
            )
            row["ngram_pairs"], row["ngram_sec"] = timed(
                lambda: ngram_jaccard_pairs(docs).count()
            )
            row["exact_groups"], row["exact_sec"] = timed(
                lambda: exact_dedup_groups(docs).count()
            )
            # the static join strategy actually planned for the MinHash
            # band self-join at this size (the audit question made a number)
            plan = mh._jdf.queryExecution().sparkPlan().toString()
            row["band_join"] = (
                "SMJ" if "SortMergeJoin" in plan
                else ("BHJ" if "BroadcastHashJoin" in plan else "other")
            )
            results["r10_dedup64"][str(factor)] = row
            print(json.dumps({factor: row}))

    # round-10 probe: the batch-replay halves of the State API v2 family
    # (what the oracle checks, and what the registry entries run when the
    # TWS runtime is not worker-visible). The streaming halves are fixed
    # trigger latency by construction (bench_all receipts); these replays
    # are the per-key WINDOW pipelines — replicated states grow KEYS
    # linearly (entity-tagged replicas), so flat-or-linear wall here is
    # the evidence that per-key state work is key-parallel with no
    # cross-key serialization.
    if want("streamrep"):
        from ltss_spark.streaming.stateful import (
            distinct_types_replay,
            gap_close_replay,
            recent_k_replay,
            running_totals_replay,
        )

        results["r10_streamrep"] = {}
        for factor in (1, 16, 32):
            states = replicated_states(spark, sf_dir, factor, base)
            ev = states.select(
                F.monotonically_increasing_id().alias("event_id"),
                F.col("entity_id").alias("user_id"),
                F.col("time").alias("ts"),
                F.col("state").alias("event_type"),
                F.coalesce(
                    F.expr("try_cast(state AS DOUBLE)"), F.lit(1.0)
                ).alias("value"),
            ).localCheckpoint(eager=False)
            row = {"n_events": ev.count()}
            row["totals_rows"], row["totals_sec"] = timed(
                lambda: running_totals_replay(ev).count()
            )
            row["distinct_rows"], row["distinct_sec"] = timed(
                lambda: distinct_types_replay(ev).count()
            )
            row["recentk_rows"], row["recentk_sec"] = timed(
                lambda: recent_k_replay(ev).count()
            )
            lo, hi = ev.agg(
                F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
            ).first()
            cut1 = lo + (hi - lo) // 3
            cut2 = lo + 2 * (hi - lo) // 3
            row["gap_rows"], row["gap_sec"] = timed(
                lambda: gap_close_replay(ev, cut1, cut2, gap_ms=60_000).count()
            )
            results["r10_streamrep"][str(factor)] = row
            print(json.dumps({factor: row}))

    # round-10 probe: the corpus-wide IVF kNN self-join two factors past
    # the r7 table (8x -> 32x; C ∝ N holds average cell size ≈ 125, so
    # per-vector candidate volume is constant and total work ∝ N).
    if want("knn32"):
        from ltss_spark.operators.similarity import knn_join

        results["r10_knn32"] = {}
        knn_join(emb1, k=5, method="ivf", n_centroids=16, nprobe=4).count()
        for factor in (16, 32):
            embsh = replicated_embeddings_shifted(spark, sf_dir, factor, base)
            n = embsh.count()
            c = max(16, n // 125)
            rows, sec = timed(
                lambda: knn_join(
                    embsh, k=5, method="ivf", n_centroids=c, nprobe=4
                ).count()
            )
            results["r10_knn32"][str(factor)] = {
                "n_vecs": n,
                "n_centroids": c,
                "knn_rows": rows,
                "knn_sec": sec,
            }
            print(json.dumps({factor: results["r10_knn32"][str(factor)]}))

    # round-10 probe: the gradient-descent classifier family. The loop is
    # n_iters x (one map-side-combined gradient aggregate + one accuracy
    # aggregate) — cost ∝ corpus per iteration with 3-long partials, so
    # wall should track the feature pass, not the model.
    if want("lr32"):
        from ltss_spark.operators.ml import logreg_score, logreg_train

        results["r10_lr32"] = {}
        logreg_train(warm, n_iters=1).count()  # warm
        for factor in (1, 16, 32):
            docs = replicated_docs(spark, sf_dir, factor, base)
            row = {"n_docs": docs.count()}
            row["train_rows"], row["train_sec"] = timed(
                lambda: logreg_train(docs, n_iters=3).count()
            )
            row["score_rows"], row["score_sec"] = timed(
                lambda: logreg_score(docs, n_iters=3).count()
            )
            results["r10_lr32"][str(factor)] = row
            print(json.dumps({factor: row}))

    # round-11 probe: containment dedup at 16x/64x. Same inverted-index
    # shape as ngram Jaccard (shared shingle plumbing, df-capped
    # universe); replicas are letter-tagged so each replica's shingles
    # are disjoint — candidate volume and output pairs grow linearly
    # with the factor, which is what the probe checks (no quadratic
    # term sneaking in through the sizes joins).
    if want("cont64"):
        from ltss_spark.operators.dedup import ngram_containment_pairs

        results["r11_cont64"] = {}
        ngram_containment_pairs(warm).count()  # warm
        for factor in (16, 64):
            docs = replicated_docs(spark, sf_dir, factor, base)
            row = {"n_docs": docs.count()}
            row["pairs"], row["sec"] = timed(
                lambda: ngram_containment_pairs(docs).count()
            )
            results["r11_cont64"][str(factor)] = row
            print(json.dumps({factor: row}))

    # round-11 probe: stream_tws_ooo (out-of-order State API v2 prefix
    # entry). The axis that matters is BUFFERED ROWS: same users, same
    # time span, f x the events — each key's list-state buffer and every
    # watermark drain grow ∝ f while the micro-batch count stays fixed
    # (4 files + the finalization batch), so the expected shape is fixed
    # trigger/RocksDB latency + a linear term. Runs the REAL streaming
    # entry end-to-end (skipped with a note when the State API v2
    # runtime is not worker-visible in this JVM).
    if want("twsooo"):
        import ltss_spark.plans as plans
        from ltss_spark.streaming.stateful import (
            _require_worker_visible_protobuf,
            tws_available,
        )

        results["r11_twsooo"] = {}
        ok = tws_available()
        if ok:
            try:
                _require_worker_visible_protobuf(spark)
            except RuntimeError:
                ok = False
        if not ok:
            results["r11_twsooo"]["skipped"] = "tws runtime unavailable"
        else:
            ev = spark.read.parquet(
                os.path.join(sf_dir, "events.parquet")
            ).select("event_id", "user_id", "ts", "value")
            n0 = ev.agg(F.max("event_id")).first()[0] + 1
            q = plans.queries()["stream_tws_ooo"]
            for factor in (1, 4):
                rep = ev
                for i in range(1, factor):
                    rep = rep.union(
                        ev.select(
                            (F.col("event_id") + F.lit(i * n0)).alias(
                                "event_id"
                            ),
                            "user_id",
                            "ts",
                            "value",
                        )
                    )
                d = os.path.join(base, f"twsooo_x{factor}")
                os.makedirs(d, exist_ok=True)
                rep.coalesce(8).write.mode("overwrite").parquet(
                    os.path.join(d, "events.parquet")
                )
                row = {
                    "n_events": spark.read.parquet(
                        os.path.join(d, "events.parquet")
                    ).count()
                }
                row["out_rows"], row["sec"] = timed(lambda: q(spark, d).count())
                results["r11_twsooo"][str(factor)] = row
                print(json.dumps({factor: row}))

    # round-11 probe: the third-batch entries (BFS / drift / skipgram).
    # - bfs: node-offset replicas of the sf co-purchase graph are DISJOINT
    #   subgraphs with replicated seeds — reached rows and wall must grow
    #   ∝ f (frontier work is per-component; no cross-replica edges exist
    #   to couple them). Forced distributed (small_graph_edges=0): the
    #   probe times the frontier-join loop, not the driver replay.
    # - drift/skipgram: token-tagged replicas make replica vocabularies
    #   disjoint, so vocab (and the skip-gram pair key space) grows ∝ f
    #   while per-token work is flat — the expected shape is linear scan
    #   cost + linear aggregate state, no quadratic term anywhere.
    if want("newops"):
        from ltss_spark.operators.corpus import corpus_drift
        from ltss_spark.operators.graph import bfs_hops
        from ltss_spark.operators.text import skipgram_counts

        li0 = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
            "l_orderkey", "l_partkey"
        )
        a0, b0 = li0.alias("a"), li0.alias("b")
        e0 = (
            a0.join(b0, "l_orderkey")
            .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
            .select(
                F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b")
            )
            .distinct()
        )
        npart = li0.agg(F.max("l_partkey")).first()[0] + 1

        def rep_graph(factor):
            parts = [
                e0.select(
                    (F.col("a") + F.lit(i * npart)).alias("a"),
                    (F.col("b") + F.lit(i * npart)).alias("b"),
                )
                for i in range(factor)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.union(p)
            path = os.path.join(base, f"bfs_edges_x{factor}")
            out.repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)

        results["r11_newops"] = {"bfs": {}}
        warm_e = rep_graph(1)
        warm_seeds = warm_e.select(F.col("a").alias("node")).filter(
            F.col("node") % 97 == 0
        )
        bfs_hops(warm_e, warm_seeds, max_hops=3, small_graph_edges=0).count()
        corpus_drift(
            warm.filter(F.col("doc_id") % 10 != 0),
            warm.filter(F.col("doc_id") % 10 == 0),
        ).count()
        skipgram_counts(warm).count()
        for factor in (1, 4, 16):
            edges = rep_graph(factor)
            seeds = edges.select(F.col("a").alias("node")).filter(
                F.col("node") % 97 == 0
            )
            row = {"n_edges": edges.count()}
            row["reached"], row["sec"] = timed(
                lambda: bfs_hops(
                    edges, seeds, max_hops=3, small_graph_edges=0
                ).count()
            )
            results["r11_newops"]["bfs"][str(factor)] = row
            print(json.dumps({"bfs": {factor: row}}))
        for factor in (4, 16):
            docs = replicated_docs(spark, sf_dir, factor, base)
            # cardinality check only — the aggregate state both ops carry
            # is ∝ vocab (disjoint per tagged replica), so this must be
            # exactly factor-linear; the ops themselves are timed at their
            # registered top-k (an uncapped limit would make TakeOrdered
            # allocate a k-sized heap: measured OOM at k=1e9)
            row = {
                "n_docs": docs.count(),
                "vocab": docs.select(
                    F.explode(F.split(F.lower("text"), " ")).alias("t")
                )
                .filter(F.col("t") != "")
                .distinct()
                .count(),
            }
            _, row["drift_sec"] = timed(
                lambda: corpus_drift(
                    docs.filter(F.col("doc_id") % 10 != 0),
                    docs.filter(F.col("doc_id") % 10 == 0),
                ).count()
            )
            _, row["skipgram_sec"] = timed(
                lambda: skipgram_counts(docs).count()
            )
            results["r11_newops"][f"text_{factor}"] = row
            print(json.dumps({"text": {factor: row}}))

    # round-12 probe: LPA communities + suffix-group substring dedup.
    # - lpa: node-offset replicas are DISJOINT subgraphs, so labels never
    #   cross replicas — rows and wall must grow ∝ f at a FIXED round
    #   count (4 budgeted rounds regardless of size: per-round work is one
    #   join + two hash aggs over the edge list). Forced distributed.
    # - suffix: token-tagged replicas share no spans, so positions,
    #   duplicated groups, and every round's relabel state all grow ∝ f
    #   at a FIXED round count (3 doublings for width 8) — the
    #   vocab-linear-state shape VERDICT r11 item 3 asks to receipt.
    #   Forced doubling (direct_positions=0); the adaptive direct path is
    #   timed alongside for the crossover picture.
    if want("r12ops"):
        from ltss_spark.operators.dedup import suffix_span_groups
        from ltss_spark.operators.graph import label_propagation

        li0 = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
            "l_orderkey", "l_partkey"
        )
        a0, b0 = li0.alias("a"), li0.alias("b")
        e0 = (
            a0.join(b0, "l_orderkey")
            .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
            .select(
                F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b")
            )
            .distinct()
        )
        npart = li0.agg(F.max("l_partkey")).first()[0] + 1

        def rep_graph12(factor):
            parts = [
                e0.select(
                    (F.col("a") + F.lit(i * npart)).alias("a"),
                    (F.col("b") + F.lit(i * npart)).alias("b"),
                )
                for i in range(factor)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.union(p)
            path = os.path.join(base, f"lpa_edges_x{factor}")
            out.repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)

        results["r12ops"] = {"lpa": {}, "suffix": {}}
        warm_e = rep_graph12(1)
        label_propagation(warm_e, max_iter=4, small_graph_edges=0).count()
        for factor in (1, 4, 16):
            edges = rep_graph12(factor)
            st = {}
            row = {"n_edges": edges.count()}
            row["nodes"], row["sec"] = timed(
                lambda: label_propagation(
                    edges, max_iter=4, small_graph_edges=0, stats=st
                ).count()
            )
            row["rounds"] = st.get("rounds")
            results["r12ops"]["lpa"][str(factor)] = row
            print(json.dumps({"lpa": {factor: row}}))
        warm_docs = replicated_docs(spark, sf_dir, 1, base, tag="sfx")
        suffix_span_groups(warm_docs, direct_positions=0).count()
        for factor in (1, 4, 16):
            docs = replicated_docs(spark, sf_dir, factor, base, tag="sfx")
            row = {
                "n_docs": docs.count(),
                "n_positions": docs.select(
                    F.sum(
                        F.size(F.split(F.lower(F.trim("text")), r"\s+"))
                    )
                ).first()[0],
            }
            row["n_groups"], row["doubling_sec"] = timed(
                lambda: suffix_span_groups(docs, direct_positions=0).count()
            )
            # adaptive DEFAULT run: below the direct_positions bound this
            # times the direct single-exchange grouping; above it the
            # default itself takes the doubling path — record which, so
            # the artifact never reads doubling-vs-doubling as a crossover
            ast = {}
            _, row["adaptive_sec"] = timed(
                lambda: suffix_span_groups(docs, stats=ast).count()
            )
            row["adaptive_path"] = ast.get("path")
            results["r12ops"]["suffix"][str(factor)] = row
            print(json.dumps({"suffix": {factor: row}}))

    if want("r13"):
        # VERDICT r12 item 6: re-time the r12/r13-touched operators at
        # replica factors where shuffles dominate stage waves, and record
        # the core count in the key so a cpus=8 companion run exposes the
        # 8->32 wall-clock ratio that sf0.1 alone cannot resolve.
        # Sub-probes: ts_changepoint_cusum (r12 window-aggregate rewrite),
        # sql_q18 (r12 IN-subquery -> aggregate-once join), ext_dedup
        # cluster pipeline (r12 broadcast union-find frame),
        # cosine_topk_lsh (r13 LocalTableScan probe side).
        from ltss_spark.operators.timeseries import cusum_changepoints
        from ltss_spark.sources.batch import load_table as _lt

        key = f"r13_cpus{cpus}"
        results[key] = {"cusum": {}, "q18": {}, "cluster": {}, "lsh": {}}

        ev0 = _lt(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "value"
        )
        n_users = ev0.agg(F.max("user_id")).first()[0] + 1
        n_ids = ev0.agg(F.max("event_id")).first()[0] + 1

        def rep_events(factor):
            parts = [
                ev0.select(
                    (F.col("event_id") + F.lit(i * n_ids)).alias("event_id"),
                    (F.col("user_id") + F.lit(i * n_users)).alias("user_id"),
                    "ts",
                    "value",
                )
                for i in range(factor)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.union(p)
            path = os.path.join(base, f"r13_events_x{factor}")
            out.repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)

        cusum_changepoints(rep_events(1)).count()  # warm
        for factor in (1, 4, 16):
            ev = rep_events(factor)
            row = {"n_events": ev.count()}
            row["rows"], row["sec"] = timed(
                lambda: cusum_changepoints(ev).count()
            )
            results[key]["cusum"][str(factor)] = row
            print(json.dumps({f"cusum@{cpus}": {factor: row}}))

        li0 = _lt(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        o0 = _lt(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        cust = _lt(spark, sf_dir, "customer").select(
            "c_custkey", "c_name"
        )
        n_ord = o0.agg(F.max("o_orderkey")).first()[0] + 1

        def rep_orders_lineitem(factor):
            lps, ops = [], []
            for i in range(factor):
                lps.append(
                    li0.select(
                        (F.col("l_orderkey") + F.lit(i * n_ord)).alias("l_orderkey"),
                        "l_quantity",
                    )
                )
                ops.append(
                    o0.select(
                        (F.col("o_orderkey") + F.lit(i * n_ord)).alias("o_orderkey"),
                        "o_custkey",
                        "o_totalprice",
                    )
                )
            lo, oo = lps[0], ops[0]
            for p in lps[1:]:
                lo = lo.union(p)
            for p in ops[1:]:
                oo = oo.union(p)
            lpath = os.path.join(base, f"r13_li_x{factor}")
            opath = os.path.join(base, f"r13_o_x{factor}")
            lo.repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(lpath)
            oo.repartition(
                spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(opath)
            return spark.read.parquet(lpath), spark.read.parquet(opath)

        def q18(li, oo):
            li.createOrReplaceTempView("r13_lineitem")
            oo.createOrReplaceTempView("r13_orders")
            cust.createOrReplaceTempView("r13_customer")
            return spark.sql(
                """
                WITH big AS (
                    SELECT l_orderkey AS big_orderkey FROM r13_lineitem
                    GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
                )
                SELECT c_custkey, c_name, o_orderkey, o_totalprice,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE)
                         AS total_qty
                FROM r13_customer, r13_orders, r13_lineitem, big
                WHERE o_orderkey = big_orderkey
                  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
                GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
                ORDER BY o_totalprice DESC, o_orderkey ASC
                LIMIT 100
                """
            )

        q18(*rep_orders_lineitem(1)).count()  # warm
        for factor in (1, 4, 16):
            li, oo = rep_orders_lineitem(factor)
            row = {"n_lineitem": li.count()}
            row["rows"], row["sec"] = timed(lambda: q18(li, oo).count())
            results[key]["q18"][str(factor)] = row
            print(json.dumps({f"q18@{cpus}": {factor: row}}))

        warm13 = replicated_docs(spark, sf_dir, 1, base, tag="r13w")
        connected_components(
            minhash_lsh_pairs(warm13), small_graph_edges=0
        ).count()
        for factor in (1, 4, 16):
            docs = replicated_docs(spark, sf_dir, factor, base, tag="r13")
            row = {"n_docs": docs.count()}
            row["components"], row["sec"] = timed(
                lambda: connected_components(
                    minhash_lsh_pairs(docs), small_graph_edges=0
                ).count()
            )
            results[key]["cluster"][str(factor)] = row
            print(json.dumps({f"cluster@{cpus}": {factor: row}}))

        # warm frames get their OWN tag: the factor loop overwrites the
        # <tag>_x1 path, and probe13 must keep resolving across iterations
        emb_warm13 = replicated_embeddings(spark, sf_dir, 1, base, tag="r13w")
        probe13 = emb_warm13.filter(F.col("vec_id") < 3)
        cosine_topk_lsh(emb_warm13, probe13).count()
        for factor in (1, 4, 16):
            emb = replicated_embeddings(spark, sf_dir, factor, base, tag="r13")
            row = {"n_vectors": emb.count()}
            row["rows"], row["sec"] = timed(
                lambda: cosine_topk_lsh(emb, probe13).count()
            )
            results[key]["lsh"][str(factor)] = row
            print(json.dumps({f"lsh@{cpus}": {factor: row}}))

    # partial runs merge into the existing probe file: one new operator
    # family should not require re-timing (or losing) the whole suite
    if "all" not in sections and os.path.exists(out_json):
        with open(out_json) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()

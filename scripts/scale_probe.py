"""Empirical scaling probe: replicate the documents table 1x/2x/4x (each
replica token-tagged so replicas are NOT near-duplicates of each other —
otherwise the pair graph itself grows quadratically and the probe would
measure the data change, not the algorithm) and time the dedup scale paths.

Near-linear growth here is the local-mode evidence for the 100 TB claim:
every measured operator is one or two hash-shuffles whose volume is linear
in the input (shingles, signatures, band buckets), with no all-pairs term.

Usage: python scripts/scale_probe.py [sf_dir] [out_json]
"""

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def replicated_docs(spark, sf_dir, factor, base_dir):
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
    path = os.path.join(base_dir, f"docs_x{factor}")
    out.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "scale_probe.json"

    from pyspark.sql import SparkSession

    from ltss_spark.operators.corpus import repetition_stats
    from ltss_spark.operators.dedup import exact_dedup_groups, minhash_lsh_pairs
    from ltss_spark.operators.graph import connected_components
    from ltss_spark.session import pin_session_for_oracle

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
    results = {"sf_dir": sf_dir, "factors": {}}
    warm = replicated_docs(spark, sf_dir, 1, base)
    # untimed warmup: JVM/codegen/broadcast machinery out of the 1x numbers
    minhash_lsh_pairs(warm).count()
    connected_components(minhash_lsh_pairs(warm)).count()
    exact_dedup_groups(warm).count()
    repetition_stats(warm).count()

    for factor in (1, 2, 4, 8):
        docs = replicated_docs(spark, sf_dir, factor, base)
        row = {"n_docs": docs.count()}
        row["minhash_pairs"], row["minhash_sec"] = timed(
            lambda: minhash_lsh_pairs(docs).count()
        )
        row["cc_components"], row["cc_sec"] = timed(
            lambda: connected_components(minhash_lsh_pairs(docs)).count()
        )
        row["exact_groups"], row["exact_sec"] = timed(
            lambda: exact_dedup_groups(docs).count()
        )
        row["repetition_rows"], row["repetition_sec"] = timed(
            lambda: repetition_stats(docs).count()
        )
        results["factors"][str(factor)] = row
        print(json.dumps({factor: row}))

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()

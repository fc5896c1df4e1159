"""Streaming incremental near-duplicate detection.

The batch dedup family answers "which documents in THIS corpus are
near-dups of each other"; a live ingestion pipeline needs the other
tense — "is this NEW document a near-dup of anything we already hold?"
as batches arrive. Mechanism:

- a persistent SIGNATURE STORE holds the (band, band_sig) LSH keys of
  every document seen so far (``operators.dedup.band_signatures`` — the
  same keys the batch pair join buckets on);
- each micro-batch computes its own band signatures ONCE, probes the
  store with a semi-join (a doc is flagged iff ANY of its bands already
  exists), appends its verdicts to the output, and then appends its own
  signatures to the store — so later batches see earlier batches'
  documents, exactly the reference's insert-then-visible ordering.

Scale shape: the store is append-only parquet keyed by (band, band_sig)
— at 100 TB it would be bucket-partitioned on the band key so the probe
is a co-located join; the per-batch work is |batch| shingles + one
equi-join against the store, never corpus x corpus. State lives in
FILES, not executor memory — a restart rebuilds nothing (contrast
applyInPandasWithState, whose store must fit the state backend).

Flag-only semantics (like the reference's duplicate handling, PK
models.py:31-32: later arrivals are the duplicates): the FIRST document
of a near-dup cluster to arrive is kept clean, later ones flag. Within
one micro-batch, intra-batch duplicates are NOT flagged against each
other (they probe the store as it stood before the batch); the batch
boundary is the visibility boundary, the same contract as the PK-upsert
sink's staging dedup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def run_streaming_near_dup(
    spark: SparkSession,
    docs_dir: str,
    store_path: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 12,
    bands: int = 4,
    max_files_per_trigger: int = 1,
) -> None:
    """Run the bounded near-dup stream over the parquet files in
    ``docs_dir``: per micro-batch, append (doc_id, dup_of_earlier) to
    ``out_path`` and the batch's signatures to ``store_path``. Seed the
    store beforehand (band_signatures(...).write.parquet(store_path)) to
    dedup against a pre-existing corpus."""
    from ltss_spark.operators.dedup import band_signatures

    schema = spark.read.parquet(docs_dir).schema

    def body(batch: DataFrame, epoch_id: int) -> None:
        # eager checkpoint: the signatures feed the probe AND the store
        # append; uncheckpointed, the shingle pipeline would run twice
        sigs = band_signatures(
            batch, text_col, id_col, k, num_hashes, bands
        ).localCheckpoint()
        bspark = batch.sparkSession
        try:
            store = bspark.read.parquet(store_path)
            hit = (
                sigs.join(store, ["band", "band_sig"], "left_semi")
                .select("doc_id")
                .distinct()
                .withColumn("__dup", F.lit(True))
            )
        except Exception:  # first batch, no store yet
            hit = None
        out = batch.select(F.col(id_col).alias("doc_id"))
        if hit is not None:
            out = out.join(hit, "doc_id", "left").select(
                "doc_id", F.coalesce("__dup", F.lit(False)).alias("dup_of_earlier")
            )
        else:
            out = out.select("doc_id", F.lit(False).alias("dup_of_earlier"))
        out.write.mode("append").parquet(out_path)
        # visibility boundary: the batch's own signatures enter the store
        # AFTER its verdicts are written
        sigs.write.mode("append").parquet(store_path)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(docs_dir)
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

"""Multimodal column plumbing (driver-mandated extension, BASELINE.json
north_star): image/audio/video as opaque ``binary`` columns + typed
metadata, processed by Arrow-batched Pandas UDFs over ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (deterministic fake) — but the Spark-side contract is
real and tested: schemas, batch iteration, partition-preserving transforms.
On a real cluster only ``_decode_image_impl`` changes (swap the fake for
PIL/torchvision); nothing in the plan shape does.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

#: schema of a multimodal asset table: payload is opaque bytes + metadata
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _decode_image_impl(payload: bytes) -> tuple[int, int]:
    """STUB — no imaging library in this container.

    Deterministic fake: derives (width, height) from the payload hash so
    the pipeline shape is testable end-to-end. Replace with e.g.
    ``PIL.Image.open(io.BytesIO(payload)).size`` in production; the UDF
    signature and plan do not change.
    """
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return 16 + h[0] % 64, 16 + h[1] % 64


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, hash + size + the
    (stubbed) decoded dimensions. Arrow batching keeps Python overhead
    amortized; the transform is narrow (no shuffle) so it scales linearly
    with input splits."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            dims = pdf["payload"].map(
                lambda p: _decode_image_impl(bytes(p) if p is not None else b"")
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ).astype("int32"),
                    "sha": pdf["payload"].map(
                        lambda p: hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                    ),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return assets.mapInPandas(fn, schema=FEATURE_SCHEMA)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads — lets the
    multimodal plumbing run against the driver's `documents` table."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "utf-8").cast("binary").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )

"""Multimodal column plumbing (driver-mandated extension, BASELINE.json
north_star): image/audio/video as opaque ``binary`` columns + typed
metadata, processed by Arrow-batched Pandas UDFs over ``mapInPandas``.

Decode sits behind a runtime capability probe: when PIL is importable in
the worker process, ``decode_image`` uses it; otherwise it falls back to a
clearly-marked deterministic stub. This container has no imaging libraries,
so the stub branch is what runs end-to-end here — but the Spark-side
contract is identical on both branches and both are tested (the PIL branch
via an injected fake module): schemas, batch iteration, partition-
preserving transforms. Nothing in the plan shape depends on the branch.
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


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB branch — used when no imaging library is importable (this
    container). Deterministic fake: derives (width, height) from the
    payload hash so the pipeline shape is testable end-to-end."""
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return 16 + h[0] % 64, 16 + h[1] % 64


def _probe_imaging():
    """Capability probe: returns a PIL-backed decode callable when PIL is
    importable in THIS process, else None. Runs lazily inside each Python
    worker (module state is per-process), so executors with PIL installed
    decode for real while bare ones stub — no config flag to keep in sync
    with the actual environment."""
    try:
        from PIL import Image
    except ImportError:
        return None
    import io

    def _pil_decode(payload: bytes) -> tuple[int | None, int | None]:
        try:
            with Image.open(io.BytesIO(payload)) as im:
                return int(im.size[0]), int(im.size[1])
        except Exception:
            # corrupt/undecodable payload: null dims, never a task failure
            return None, None

    return _pil_decode


_DECODER = None
_DECODER_RESOLVED = False


def _resolve_decoder():
    global _DECODER, _DECODER_RESOLVED
    if not _DECODER_RESOLVED:
        _DECODER = _probe_imaging()
        _DECODER_RESOLVED = True
    return _DECODER


def _reset_probe() -> None:
    """Test hook: force the next decode to re-run the capability probe."""
    global _DECODER_RESOLVED
    _DECODER_RESOLVED = False


def imaging_available() -> bool:
    """True when the PIL branch is active in this process."""
    return _resolve_decoder() is not None


def decode_image(payload: bytes) -> tuple[int | None, int | None]:
    """(width, height) of an image payload: PIL when available, the
    deterministic stub otherwise. Corrupt payloads on the PIL branch yield
    (None, None) rather than failing the task."""
    dec = _resolve_decoder()
    if dec is not None:
        return dec(payload or b"")
    return _decode_image_stub(payload)


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, hash + size + the
    (stubbed) decoded dimensions. Arrow batching keeps Python overhead
    amortized; the transform is narrow (no shuffle) so it scales linearly
    with input splits."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            dims = pdf["payload"].map(
                lambda p: decode_image(bytes(p) if p is not None else b"")
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
                    # nullable Int32: the PIL branch emits None for corrupt payloads
                    "width": dims.map(lambda d: d[0]).astype("Int32"),
                    "height": dims.map(lambda d: d[1]).astype("Int32"),
                }
            )

    # guide §4.1: project to exactly the consumed columns before the
    # opaque function — Spark cannot see which columns fn touches, so
    # an unpruned frame would ship (and scan) every column, e.g. the
    # adapter's meta map, through Arrow for no reader
    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        fn, schema=FEATURE_SCHEMA
    )


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads — lets the
    multimodal plumbing run against the driver's `documents` table."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "utf-8").cast("binary").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("out_w", T.IntegerType(), True),
        T.StructField("out_h", T.IntegerType(), True),
        T.StructField("thumb_sha", T.StringType(), True),
    ]
)


def resize_images(assets: DataFrame, max_side: int = 32) -> DataFrame:
    """mapInPandas resize: decode (stubbed), clamp the longer side to
    ``max_side`` preserving aspect (integer floor), emit a deterministic
    'thumbnail' hash (sha256 of payload + out dims — stands in for the
    resized pixel buffer; only _decode/_resample change on a real
    cluster). Narrow transform: no shuffle, scales with input splits."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                w, h = decode_image(p)
                if w is None or h is None:  # undecodable on the PIL branch
                    rows.append((aid, None, None, None, None, None))
                    continue
                scale = min(1.0, max_side / max(w, h))
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                thumb = hashlib.sha256(p + f":{ow}x{oh}".encode()).hexdigest()
                rows.append((aid, w, h, ow, oh, thumb))
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "out_w", "out_h", "thumb_sha"]
            ).astype({"width": "Int32", "height": "Int32", "out_w": "Int32", "out_h": "Int32"})

    # guide §4.1: fn reads only (asset_id, payload)
    return assets.select("asset_id", "payload").mapInPandas(
        fn, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("frame_sha", T.StringType(), True),
    ]
)


def sample_frames(assets: DataFrame, every_n: int = 4) -> DataFrame:
    """mapInPandas frame sampling: one input 'video' row fans out to one
    row per sampled frame (frame count decoded from the payload — stubbed
    deterministically as len(payload) % 32 + 1). The table-function shape
    for multimodal decode: variable fan-out, still a narrow transform."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                n_frames = len(p) % 32 + 1
                for idx in range(0, n_frames, every_n):
                    sha = hashlib.sha256(p + f":f{idx}".encode()).hexdigest()
                    rows.append((aid, n_frames, idx, sha))
            yield pd.DataFrame(
                rows, columns=["asset_id", "n_frames", "frame_idx", "frame_sha"]
            ).astype({"n_frames": "int32", "frame_idx": "int32"})

    # guide §4.1: fn reads only (asset_id, payload)
    return assets.select("asset_id", "payload").mapInPandas(
        fn, schema=FRAME_SCHEMA
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("loudness", T.DoubleType(), True),
    ]
)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """mapInPandas audio feature extraction (duration / sample rate /
    loudness). Decode is a deterministic stub (no audio libs here):
    duration and loudness derive from payload bytes; swap
    ``_decode_audio_impl`` for soundfile/librosa in production — schema,
    batching, and plan shape stay identical."""

    def _decode_audio_impl(p: bytes) -> tuple[int, int, float]:
        import hashlib

        h = hashlib.md5(p or b"").digest()
        duration_ms = 500 + (len(p) % 10_000)
        sample_rate = (8000, 16000, 44100, 48000)[h[2] % 4]
        loudness = round(-60.0 + (h[3] / 255.0) * 60.0, 6)
        return duration_ms, sample_rate, loudness

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                dur, sr, loud = _decode_audio_impl(p)
                rows.append((aid, len(p), dur, sr, loud))
            yield pd.DataFrame(
                rows, columns=["asset_id", "n_bytes", "duration_ms", "sample_rate", "loudness"]
            ).astype({"n_bytes": "int32", "duration_ms": "int32", "sample_rate": "int32"})

    # guide §4.1: fn reads only (asset_id, payload)
    return assets.select("asset_id", "payload").mapInPandas(
        fn, schema=AUDIO_SCHEMA
    )

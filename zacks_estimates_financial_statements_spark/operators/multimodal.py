"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schemas, batching, partition sizing, UDF
signatures) is real and tested; the codec calls themselves are STUBBED —
the image/audio libraries are not in this container. Each stub either
raises ``NotImplementedError`` (strict mode) or produces a deterministic
fake derived from the bytes (test mode), clearly marked.

Design notes for 100 TB:
- media rows are large; ``mapInPandas`` with a bounded
  ``arrow.maxRecordsPerBatch`` keeps worker memory flat;
- decode outputs are *narrow* (features/metadata), so the expensive scan
  emits small rows — project early, never carry the bytes past decode;
- binary payloads should live in their own column family / file group
  (Parquet stores them contiguously), so metadata-only queries prune the
  media column entirely (column pruning is verified in tests).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal row: opaque payload + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image|audio|video
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),       # images/video
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),    # audio/video
])

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, "
    "features array<float>, decode_error string"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_idx int, ts_ms long, frame_bytes binary"
)


def _fake_features(payload: bytes, dims: int) -> list[float]:
    """Deterministic stand-in for a real image embedding: byte histogram
    folded to ``dims`` buckets, L1-normalized. STUB — replace with a real
    model/codec in production."""
    counts = [0] * dims
    for i, b in enumerate(payload or b""):
        counts[(b + i) % dims] += 1
    total = sum(counts) or 1
    return [c / total for c in counts]


def decode_image_features(media: DataFrame, dims: int = 8,
                          strict: bool = False) -> DataFrame:
    """Image payloads → feature rows via Arrow-batched ``mapInPandas``.

    ``strict=True`` raises ``NotImplementedError`` per row (no codec in
    this container); default emits the deterministic fake so the full
    pipeline (schema, batching, downstream joins) is exercisable.
    """
    import pandas as pd

    from zacks_estimates_financial_statements_spark.util import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload, w, h in zip(pdf["media_id"], pdf["payload"],
                                          pdf["width"], pdf["height"]):
                if strict:
                    raise NotImplementedError(
                        "image decode requires a codec library not present "
                        "in this container")
                try:
                    payload = bytes(payload) if payload is not None else b""
                    rows.append({
                        "media_id": mid,
                        "width": None if pd.isna(w) else int(w),
                        "height": None if pd.isna(h) else int(h),
                        "n_bytes": len(payload),
                        "features": _fake_features(payload, dims),
                        "decode_error": None,
                    })
                except Exception as exc:  # noqa: BLE001 — quarantine row
                    rows.append({"media_id": mid, "width": None,
                                 "height": None, "n_bytes": 0,
                                 "features": None,
                                 "decode_error": str(exc)})
            yield pd.DataFrame(rows, columns=["media_id", "width", "height",
                                              "n_bytes", "features",
                                              "decode_error"])

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "payload", "width", "height")
            .mapInPandas(fn, IMAGE_FEATURES_SCHEMA))


def sample_video_frames(media: DataFrame, every_ms: int = 1000,
                        strict: bool = False) -> DataFrame:
    """Video payloads → sampled frame rows (frame extraction STUBBED: one
    synthetic frame marker per ``every_ms`` of reported duration)."""
    import pandas as pd

    from zacks_estimates_financial_statements_spark.util import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"],
                                         pdf["duration_ms"]):
                if strict:
                    raise NotImplementedError(
                        "video decode requires a codec library not present "
                        "in this container")
                dur = 0 if pd.isna(dur) else int(dur)
                payload = bytes(payload) if payload is not None else b""
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    # STUB frame: deterministic byte slice marker
                    rows.append({"media_id": mid, "frame_idx": i,
                                 "ts_ms": ts,
                                 "frame_bytes": payload[:16]})
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "ts_ms", "frame_bytes"])

    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload", "duration_ms")
            .mapInPandas(fn, FRAME_SAMPLE_SCHEMA))


def media_metadata_only(media: DataFrame) -> DataFrame:
    """Metadata projection — must NOT read the payload column (verified by
    checking the scan's ReadSchema in tests; at 100 TB this is the
    difference between a metadata query and a full-corpus scan)."""
    return media.select("media_id", "kind", "mime", "width", "height",
                        "duration_ms")

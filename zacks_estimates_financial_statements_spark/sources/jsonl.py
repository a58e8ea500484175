"""JSONL corpus source with corrupt-record quarantine.

JSONL is the interchange format training corpora actually arrive in,
and at crawl scale some fraction of every delivery is malformed —
truncated lines, encoding damage, schema drift. Failing the job
(FAILFAST) or silently nulling bad rows (default PERMISSIVE without
inspection) are both wrong at 100 TB; the operable pattern is the one
the rest of this engine uses for media payloads: decode what parses,
QUARANTINE the rest with the raw evidence attached, and let the
pipeline publish quarantine counts instead of dying mid-scan.
"""

from __future__ import annotations

from typing import Callable  # noqa: F401 — referenced in annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str, schema: StructType,
               ) -> tuple[DataFrame, DataFrame, "Callable[[], None]"]:
    """Read JSONL with an explicit schema; returns
    ``(good, quarantine, release)``.

    ``good`` carries the declared columns for rows that parsed;
    ``quarantine`` carries the raw offending line (so the evidence
    survives for triage) for rows that did not. Parsing is PERMISSIVE
    with ``columnNameOfCorruptRecord``; the input is read ONCE and the
    split is two filters over the same persisted scan. (Spark refuses a
    filter that references only the internal corrupt-record column on a
    lazy scan — SPARK-21610 — so the parsed frame is persisted first.)

    The persist is ``DISK_ONLY``, never memory: a delivery can be the
    size of the corpus, and a MEMORY_AND_DISK cache of the raw scan
    would evict working memory from every downstream stage before
    spilling anyway. Disk-persisting ~one delivery is the floor cost of
    the corrupt-column split; callers who have consumed both sides
    (written the good rows, published quarantine counts) should call
    ``release()`` to drop the scratch copy — quarantine splits are a
    terminal read-and-route step, so the natural lifetime is one job.

    The declared ``schema`` must not already contain ``_corrupt_record``;
    gzip/zstd-compressed shards (e.g. ``write_training_shards`` output)
    decode transparently via the codec extension.
    """
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not declare {CORRUPT_COL}")
    # StructType.add mutates in place — build a fresh type so the
    # caller's schema object stays clean
    from pyspark.sql.types import StructField
    full = StructType(list(schema.fields)
                      + [StructField(CORRUPT_COL, StringType())])
    df = (spark.read
          .schema(full)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CORRUPT_COL)
          .json(path))
    df = df.persist(StorageLevel.DISK_ONLY)
    good = (df.filter(F.col(CORRUPT_COL).isNull())
            .select(*schema.fieldNames()))
    quarantine = (df.filter(F.col(CORRUPT_COL).isNotNull())
                  .select(F.col(CORRUPT_COL).alias("raw_line")))

    def release() -> None:
        df.unpersist()

    return good, quarantine, release

"""Skew-join handling: detection + deterministic salting.

AQE's skew-join splitting (enabled in ``session.py``) handles most skew
at runtime by splitting oversized shuffle partitions. Salting is the
explicit fallback for the cases AQE cannot fix — e.g. a single hot key
that exceeds one executor's memory in a sort-merge join, or a
broadcast-ineligible dimension with hot keys.

``salted_join`` replicates the *small* side ``buckets`` times and sprays
the large side's rows across buckets with a deterministic hash of the
whole row (no ``rand()`` — results and retries stay deterministic), so a
hot key's rows land in ``buckets`` different shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def skewed_keys(df: DataFrame, key_cols: list[str],
                ratio: float = 8.0, min_rows: int = 1000) -> DataFrame:
    """Keys whose row count exceeds ``ratio`` × the mean key size (and
    ``min_rows``): the candidates worth salting. One aggregation pass."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    mean = counts.agg(F.avg("n").alias("m"))
    return (counts.join(F.broadcast(mean))
            .filter((F.col("n") >= F.col("m") * ratio)
                    & (F.col("n") >= min_rows))
            .drop("m"))


def salted_join(large: DataFrame, small: DataFrame, on: list[str],
                how: str = "inner", buckets: int = 16) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated
    ``buckets``×. Supports inner / left joins (the shapes the engine's
    upserts and dimension joins use). Join output equals the unsalted
    join exactly; only the physical distribution changes."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join does not support how={how!r}")
    spray = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]),
                   F.lit(buckets)).cast("int")
    salted_large = large.withColumn(_SALT, spray)
    replicated_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    out = salted_large.join(replicated_small, on=[*on, _SALT], how=how)
    return out.drop(_SALT)


def bloom_semi_join(large: DataFrame, small: DataFrame,
                    on: list[str] | str, how: str = "inner",
                    n_bits: int = 1 << 20,
                    n_hashes: int = 3) -> DataFrame:
    """Exact ``large.join(small, on, how)`` with an explicit BLOOM
    semi-join reduction on the large side — the 100 TB lever for joins
    whose small side is too big to broadcast exactly but whose KEY SET
    compresses into a bitmap.

    Spark's own runtime bloom filter exists but is conf-gated (and
    hangs this container's local mode — see session.py's note on
    ``spark.sql.optimizer.runtime.bloomFilter``); this operator is the
    deterministic, always-available form. The filter side builds
    ``n_hashes`` bit positions per distinct key (seeded ``xxhash64``),
    ORs them into a ``n_bits/64``-word bitmap relation, and folds that
    into ONE row holding a DENSE ``array<long>`` (O(1) ``element_at``
    probes — a map column would linear-scan its entries per lookup,
    measured 6x slower at 10M probes). The probe side attaches it via
    the whitelisted
    1-row broadcast crossJoin (the scalar-attach shape — the big side
    never shuffles for the filter) and keeps only rows whose every bit
    is set, BEFORE the real join's exchange. False positives survive to
    the exact join and are eliminated there; false negatives cannot
    occur (every key set its own bits), so the result is byte-equal to
    the plain join.

    Only ``inner`` and ``left_semi`` are allowed: for outer joins a
    pre-filter on the probe side would drop rows the join must keep.
    Default sizing: 2^20 bits / 3 hashes ≈ 1.7% false-positive rate at
    ~100k keys, a 128 KiB broadcast.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom pre-filter is sound only for inner/left_semi, "
            f"got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    kcols = [F.col(k) for k in keys]

    def positions(prefix_cols):
        return [F.pmod(F.xxhash64(F.lit(i), *prefix_cols),
                       F.lit(n_bits)) for i in range(n_hashes)]

    pos = (small.select(*keys).distinct()
           .select(F.explode(F.array(*positions(kcols))).alias("p")))
    words = (pos.select((F.col("p") / 64).cast("long").alias("w"),
                        F.call_function(
                            "shiftleft", F.lit(1).cast("long"),
                            F.pmod(F.col("p"), F.lit(64)).cast("int"))
                        .alias("b"))
             .groupBy("w").agg(F.expr("bit_or(b)").alias("bits")))
    # DENSE array<long> bitmap, not a map: element_at on a Spark map
    # column is a LINEAR scan of the entries per lookup — measured
    # 9.5 s vs 1.5 s probing 10M rows against a 16K-word map vs array
    # (tools/bloom_study.py). The range left-join completes absent
    # words with 0 so the array index IS the word index.
    n_words = (n_bits + 63) // 64
    bloom = (small.sparkSession.range(n_words)
             .select(F.col("id").alias("w"))
             .join(words, "w", "left")
             .select("w", F.coalesce("bits", F.lit(0).cast("long"))
                     .alias("bits"))
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("w", "bits"))),
                 lambda s: s["bits"]).alias("__bloom")))

    probed = large.crossJoin(F.broadcast(bloom))
    cond = None
    for p in positions(kcols):
        w = (p / 64).cast("long")
        bit = F.call_function("shiftleft", F.lit(1).cast("long"),
                              F.pmod(p, F.lit(64)).cast("int"))
        hit = (F.element_at(F.col("__bloom"), (w + 1).cast("int"))
               .bitwiseAND(bit) != 0)
        cond = hit if cond is None else (cond & hit)
    probed = probed.filter(cond).drop("__bloom")
    return probed.join(small, keys, how)

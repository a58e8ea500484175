"""Record linkage: blocked fuzzy joins for dirty-data entity matching.

Matching free-text identifiers (product names, vendor strings, user
agents) across deliveries is an edit-distance join — quadratic if done
naively, and a 100 TB corpus cannot see a ``levenshtein`` between every
pair. The standard shape (Fellegi–Sunter blocking; Christen, *Data
Matching*, Springer 2012) is: cheap deterministic BLOCKING keys reduce
the candidate space to equi-join buckets, then the exact distance runs
only inside buckets.

``fuzzy_join`` blocks on character prefix AND suffix keys: two
broadcast/shuffle equi-joins whose union covers every pair that agrees
on either end of the string. For a single character edit at position
``p`` of a length-``L`` string, the prefix block (first ``m`` chars)
catches ``p >= m`` and the suffix block catches ``p <= L-m-1`` — full
recall for one edit when ``L >= 2m``; multi-edit recall is best-effort,
as in any blocking scheme (add more passes — sorted-neighborhood,
q-gram — for higher distances).

Scale: candidates = two equi-joins on short keys (broadcast when one
side is small, shuffle-hash otherwise), `levenshtein` only on in-block
pairs, and the per-key fan-out is bounded by block cardinality, never
|left| × |right|. No UDF: Spark's ``levenshtein`` is a JVM codegen
expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from zacks_estimates_financial_statements_spark.functions.text import ascii_fold


def linkage_key(col: Column) -> Column:
    """The normalized key edit distances are computed over: ascii_fold
    (the shared 162-pair diacritic translate table) then strip every
    codepoint outside printable ASCII ``[ -~]``.

    Pinned (r11 Unicode contract fuzz) because Spark's ``levenshtein``
    counts CODEPOINT edits while DuckDB's counts BYTE edits — deleting
    one 2-byte character is distance 1 vs 2 — so cross-engine distance
    is only well-defined on pure-ASCII strings. Folding first keeps
    Latin-diacritic letters contributing as their base letter
    (standard record-linkage normalization, Christen 2012 ch. 2);
    whatever remains non-ASCII carries no stable distance and is
    dropped from the metric on BOTH engines."""
    return F.regexp_replace(ascii_fold(col), "[^ -~]", "")


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_key: str, right_key: str,
               max_dist: int = 2, block_chars: int = 3) -> DataFrame:
    """All (left, right) pairs with ``levenshtein(left_key, right_key)
    <= max_dist``, restricted to pairs sharing a ``block_chars`` prefix
    OR suffix (exact recall for one edit on strings of length
    ``>= 2*block_chars``; see module docstring).

    Output: every left column, every right column (caller aliases
    collisions), ``dist``.

    The block join and the distance filter run over the DISTINCT key
    strings of each side, not the rows: real catalogs repeat the same
    name across many rows, and repeating a key ``m`` times on the left
    and ``n`` times on the right would otherwise put ``m×n`` copies of
    every candidate through ``levenshtein``. Matched key PAIRS (already
    distance-filtered, usually tiny) then join back to both row sets —
    row-level fan-out only for actual matches.

    Unicode contract (r11, amended r12): blocking and distance run
    over ``linkage_key`` (fold → printable-ASCII projection); ``dist``
    IS the normalized-key distance. Keys whose projection is EMPTY
    carry no cross-engine distance signal, so they never enter the
    blocked/levenshtein tier — but two such keys that are EXACTLY
    equal as raw strings still link at distance 0 (r12, ADVICE:
    identical CJK/Cyrillic/Greek keys must match; exact equality is
    engine-agnostic and needs no distance metric). The exact tier is
    one equi-join on the raw key over the (distinct, non-empty-raw)
    empty-projection keys of each side — bounded fan-out, no
    quadratic "every empty matches every empty" bucket because raw
    empty strings remain unlinkable (the NULL/empty-key contract).

    Duplicate-row contract (r9 contract fuzz): output pairs are
    DISTINCT rows — verbatim physical copies on either side would
    otherwise multiply every pair they touch (m×n per candidate)
    straight into ``best_match``'s candidate counts. Rows that differ
    in ANY column remain distinct pairs. The dedup runs per SIDE, on
    each side's rows semi-restricted to matched keys (bounded by the
    match fan-in) — deduping distinct left rows and distinct right
    rows before the fan-out is row-for-row identical to a distinct of
    the joined output, without shuffling the m×n-amplified wide rows
    (ADVICE r9: the earlier plan distinct'd the final join).
    """
    lk, rk = F.col(left_key), F.col(right_key)
    ln, rn = F.col("__lnorm"), F.col("__rnorm")
    # PERSIST the distinct-key relations and the matched pair set
    # (r13): the committed plan scanned each input 10x — the prefix
    # and suffix blocks each re-derive the distinct+normalize pass,
    # the exact tier re-derives it again, and ``matched`` (referenced
    # three times in the final join) replays the WHOLE
    # blocking+levenshtein pipeline per reference, multiplicatively.
    # All three relations are bounded — distinct-KEY scale for the
    # key sides, match-fan-in scale for the pairs — so the caches are
    # small and each input is left with exactly two scans
    # (distinct-key build + row relation). Released via the standard
    # ``release_cache`` hook on the returned DataFrame.
    lall = (left.select(lk).distinct()
            .withColumn("__lnorm", linkage_key(lk))
            .persist(StorageLevel.MEMORY_AND_DISK))
    rall = (right.select(rk).distinct()
            .withColumn("__rnorm", linkage_key(rk))
            .persist(StorageLevel.MEMORY_AND_DISK))
    lkeys = lall.filter(ln.isNotNull() & (ln != ""))
    rkeys = rall.filter(rn.isNotNull() & (rn != ""))
    l = lkeys.withColumn("__lpre", F.substring(ln, 1, block_chars)) \
             .withColumn("__lsuf", F.substring(ln, -block_chars, block_chars))
    r = rkeys.withColumn("__rpre", F.substring(rn, 1, block_chars)) \
             .withColumn("__rsuf", F.substring(rn, -block_chars, block_chars))
    pre = l.join(r, F.col("__lpre") == F.col("__rpre"))
    suf = l.join(r, F.col("__lsuf") == F.col("__rsuf"))
    cand = (pre.unionByName(suf)
            .select(left_key, "__lnorm", right_key, "__rnorm").distinct())
    matched = (cand
               .withColumn("dist", F.levenshtein(ln, rn))
               .filter(F.col("dist") <= max_dist)
               .drop("__lnorm", "__rnorm"))
    # exact tier (r12): empty-projection keys link only by raw equality
    lempty = lall.filter(lk.isNotNull() & (lk != "") & (ln == "")) \
                 .select(left_key)
    rempty = rall.filter(rk.isNotNull() & (rk != "") & (rn == "")) \
                 .select(right_key)
    exact = (lempty.join(rempty, lk == rk)
             .withColumn("dist", F.lit(0)))
    matched = (matched.unionByName(exact)
               .persist(StorageLevel.MEMORY_AND_DISK))
    lrows = (left.join(matched.select(left_key).distinct(),
                       left_key, "semi").distinct())
    rrows = (right.join(matched.select(right_key).distinct(),
                        right_key, "semi").distinct())
    out = lrows.join(matched, left_key).join(rrows, right_key)

    def _release() -> None:
        matched.unpersist()
        lall.unpersist()
        rall.unpersist()

    out.release_cache = _release
    return out


def best_match(pairs: DataFrame, left_id: str, right_id: str) -> DataFrame:
    """Fold fuzzy-join pairs to the single best match per left record:
    smallest distance, ties to the smallest right id (``min(struct)`` —
    deterministic). One map-side-combined aggregation.

    NULL contract: a candidate with a NULL right id still counts toward
    ``n_candidates`` but is LEAST preferred (SQL NULLS-LAST ordering) —
    Spark's struct-min would otherwise treat NULL as smallest and pick
    an identity-less "best" match over a real one (contract fuzz)."""
    return (pairs.groupBy(left_id)
            .agg(F.min(F.struct(
                F.col("dist"),
                F.col(right_id).isNull().cast("int").alias("__nl"),
                F.col(right_id))).alias("m"),
                 F.count(F.lit(1)).alias("n_candidates"))
            .select(left_id,
                    F.col(f"m.{right_id}").alias(right_id),
                    F.col("m.dist").alias("dist"),
                    "n_candidates"))

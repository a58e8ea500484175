"""Operator-level duplicate-id contracts (round-9 contract fuzz).

``tools/contract_fuzz.py --dup-rate`` proves Spark-vs-DuckDB agreement
end-to-end on duplicate-row-injected data; these tests pin the OPERATOR
semantics the round-9 fixes settled on, so a refactor can't silently
revert one. The repo-wide rules:

- KEYED outputs (selection, pairs, clusters, per-doc scores, quota
  slots, diffs) treat verbatim physical copies of one id as ONE
  logical doc — dedup rides an exchange the plan already pays;
- PER-ROW multiset outputs (fingerprints, chunks-per-row, encoders,
  label attaches) amplify — each physical row is processed
  independently, never interleaved into a doubled token stream;
- corpus-STATISTIC operators (bm25) merge rows of one id
  deterministically and document it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zacks_estimates_financial_statements_spark.operators import (
    curation,
    dedup,
    graph,
    linkage,
    profiling,
    retrieval,
)


def _dupped(spark, rows, schema):
    """rows + verbatim clones of every row (the fuzzer's fault shape)."""
    return spark.createDataFrame(rows + rows, schema)


def test_cdc_chunks_copies_collapse_to_one_chunk_set(spark):
    df = _dupped(spark, [(1, "alpha beta gamma delta epsilon zeta")],
                 "id bigint, t string")
    out = dedup.cdc_chunks(df, "id", "t", w=3, avg_words=8).collect()
    # keyed output: one row per (id, chunk_idx), never "alpha alpha"
    assert len(out) == len({(r["id"], r["chunk_idx"]) for r in out})
    assert all("alpha alpha" not in r["chunk_text"] for r in out)


def test_winnow_fingerprints_amplify_per_physical_row(spark):
    df = spark.createDataFrame([(1, "abcdefghijkl")], "id bigint, t string")
    one = dedup.winnow_fingerprints(df, "id", "t", k=5, w=4).collect()
    two = dedup.winnow_fingerprints(
        _dupped(spark, [(1, "abcdefghijkl")], "id bigint, t string"),
        "id", "t", k=5, w=4).collect()
    assert sorted(r["fp"] for r in two) == sorted(
        r["fp"] for r in one + one)


def test_token_budget_fill_charges_duplicated_id_once(spark):
    rows = [(1, "s", "a b c", 0.9), (2, "s", "d e f", 0.8)]
    df = _dupped(spark, rows, "id bigint, src string, t string, q double")
    out = {r["id"]: r for r in curation.token_budget_fill(
        df, "src", "t", "q", "id", budget=6).collect()}
    assert out[1]["cum_tokens"] == 3 and out[2]["cum_tokens"] == 6


def test_domain_quota_copies_share_one_slot_both_paths(spark):
    rows = [(i, "h", float(100 - i)) for i in range(4)]
    df = _dupped(spark, rows, "id bigint, host string, p double")
    for exact in (True, False):
        out = curation.domain_quota(df, "host", "id", 3,
                                    priority_col="p", exact_ranks=exact)
        got = {(r["id"], r["host_rank"], r["keep"]) for r in out.collect()}
        # ids 0..3 rank 1..4 (copies share the rank); quota 3 keeps 0-2
        assert got == {(0, 1, True), (1, 2, True), (2, 3, True),
                       (3, None if not exact else 4, False)}, (exact, got)


def test_corpus_diff_one_status_per_id(spark):
    old = _dupped(spark, [(1, "a"), (2, "b")], "id bigint, t string")
    new = _dupped(spark, [(2, "b"), (3, "c")], "id bigint, t string")
    out = sorted((r["id"], r["status"]) for r in
                 curation.corpus_diff(old, new, "id", "t").collect())
    assert out == [(1, "removed"), (2, "unchanged"), (3, "added")]


def test_novelty_score_distinct_grams_per_logical_doc(spark):
    docs = _dupped(spark, [(1, "a b c d")], "id bigint, t string")
    ref = spark.createDataFrame([(9, "x y z")], "id bigint, t string")
    (row,) = curation.novelty_score(docs, ref, "id", "t", n=3).collect()
    assert (row["n_grams"], row["n_novel"]) == (2, 2)


def test_contamination_counts_distinct_overlap_per_doc(spark):
    corpus = _dupped(spark, [(1, "a b c d e")], "id bigint, t string")
    bench = spark.createDataFrame([(9, "a b c d")], "id bigint, t string")
    rows = curation.benchmark_contamination(corpus, bench, "id", "t",
                                            n=4).collect()
    # per-row output (2 identical rows), per-logical-doc distinct counts
    assert len(rows) == 2
    assert all((r["total_grams"], r["overlap_grams"]) == (2, 1)
               for r in rows)


def test_fuzzy_join_pairs_are_distinct_rows(spark):
    dirty = _dupped(spark, [(1, "widget")], "id bigint, name string")
    cat = _dupped(spark, [(7, "widgets")], "ck bigint, cname string")
    pairs = linkage.fuzzy_join(dirty, cat, "name", "cname", max_dist=1)
    (best,) = linkage.best_match(pairs, "id", "ck").collect()
    assert best["n_candidates"] == 1 and best["ck"] == 7


def test_c4_clean_lines_not_doubled_by_copies(spark):
    df = _dupped(spark, [(1, "Good line one here.\nshort")],
                 "id bigint, t string")
    rows = curation.c4_clean(df, "id", "t").collect()
    assert len(rows) == 2  # per-row attach
    assert all(r["clean_text"] == "Good line one here."
               and r["n_kept_lines"] == 1 for r in rows)


def test_cluster_labels_attach_per_row_sizes_count_ids(spark):
    docs = _dupped(spark, [(1,), (2,), (3,)], "id bigint")
    pairs = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    rows = graph.resolve_duplicate_clusters(docs, pairs, "id").collect()
    assert len(rows) == 6  # every physical row labeled
    by_id = {r["id"]: r for r in rows}
    assert by_id[1]["cluster_size"] == 2  # logical ids, not rows
    assert by_id[3]["cluster_size"] == 1


def test_bm25_merges_rows_of_one_id(spark):
    # two copies of doc 1 merge: dl doubles, N counts ids — stated
    # contract (ids are expected unique upstream; merge keeps the
    # index deterministic)
    one = spark.createDataFrame([(1, "cat dog"), (2, "cat")],
                                "id bigint, t string")
    dup = spark.createDataFrame([(1, "cat dog"), (1, "cat dog"),
                                 (2, "cat")], "id bigint, t string")
    s1 = {r["id"]: r for r in
          retrieval.bm25_score(one, "id", "t", ["cat"]).collect()}
    s2 = {r["id"]: r for r in
          retrieval.bm25_score(dup, "id", "t", ["cat"]).collect()}
    assert len(s2) == 2  # one row per id
    assert s2[1]["n_matched_terms"] == 1
    # doc 1's tf doubled but doc count stayed 2
    assert s1[1]["score"] != s2[1]["score"]


def test_robust_outliers_nonfinite_behaves_like_null(spark):
    rows = [(i, "2024-01-01 00:00:00", float(v))
            for i, v in enumerate([1, 2, 3, 4, 5])]
    base = spark.createDataFrame(rows, "id bigint, ts string, v double")
    df = base.unionByName(spark.createDataFrame(
        [(9, "2024-01-01 00:00:00", float("nan")),
         (10, "2024-01-01 00:00:00", float("inf"))],
        "id bigint, ts string, v double"))
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["id"]: r for r in
           profiling.robust_outliers(df, "ts", [], "v").collect()}
    # med/mad computed over the 5 finite values only; non-finite rows
    # kept with is_outlier NULL
    assert out[0]["med"] == 3.0
    assert out[9]["is_outlier"] is None and out[10]["is_outlier"] is None

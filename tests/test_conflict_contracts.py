"""Operator-level CONFLICTING-duplicate contracts (round-10 contract
fuzz, ``tools/contract_fuzz.py --conflict-rate``): same id, DIFFERENT
content — the fault a real incremental ingest produces on every
re-scrape of a changed page.

The fuzz gate proves Spark-vs-DuckDB agreement end-to-end; these tests
pin the OPERATOR semantics the round-10 fixes settled on, so a
refactor can't silently revert one. The repo-wide rules, layered on
round 9's verbatim-copy rules:

- KEYED single-version panels (one chunk set / gram panel / training
  example per id) resolve conflicting copies to the deterministic
  min-md5(content) WINNER version — a keyed relation cannot represent
  two versions, and merging them produces panels no single version
  has;
- per-VERSION decision operators (budget fill, domain quota) treat
  each distinct (id, contributing-columns) version as its own
  candidate: verbatim copies still collapse, divergent copies each
  charge/rank, and any attach back to physical rows is keyed by the
  FULL version (never id alone — the r9 id-only attach
  cross-multiplied versions);
- per-PHYSICAL-ROW outputs score each row on its own content
  (contamination panels), never on the union of an id's versions;
- diff/summary operators reduce each side to a per-id MIN fingerprint
  (corpus_diff) — deterministic, order-free;
- window/reassembly ORDER ties that only a divergent copy can create
  are pinned with the content itself (paragraph_dedup sorts
  struct(pidx, para)).
"""

from __future__ import annotations

from zacks_estimates_financial_statements_spark.operators import (
    curation,
    dedup,
)


def _conflicted(spark, rows, mutated, schema):
    """rows + same-id clones with mutated content (the fuzzer's
    --conflict-rate fault shape)."""
    return spark.createDataFrame(rows + mutated, schema)


def test_token_budget_fill_divergent_copies_each_charge(spark):
    # same id, same priority, different token counts: two distinct
    # fill decisions, deterministically ordered by n_tokens
    df = _conflicted(spark,
                     [(1, "s", "a b c", 0.9), (2, "s", "d e f", 0.5)],
                     [(1, "s", "a b c d", 0.9)],
                     "id bigint, src string, t string, q double")
    out = sorted((r["id"], r["n_tokens"], r["cum_tokens"])
                 for r in curation.token_budget_fill(
                     df, "src", "t", "q", "id", budget=20).collect())
    assert out == [(1, 3, 3), (1, 4, 7), (2, 3, 10)]


def test_token_budget_fill_verbatim_copies_still_charge_once(spark):
    df = _conflicted(spark, [(1, "s", "a b c", 0.9)],
                     [(1, "s", "a b c", 0.9)],
                     "id bigint, src string, t string, q double")
    out = curation.token_budget_fill(
        df, "src", "t", "q", "id", budget=20).collect()
    assert [(r["id"], r["cum_tokens"]) for r in out] == [(1, 3)]


def test_domain_quota_attach_is_keyed_by_full_version(spark):
    # one id under TWO hosts (a conflicting clone mutated the source):
    # each physical row gets ITS host's rank, not a cross product
    rows = [(1, "a.com", 9.0), (2, "a.com", 8.0)]
    clones = [(1, "b.com", 7.0)]
    df = _conflicted(spark, rows, clones, "id bigint, host string, p double")
    for exact in (True, False):
        out = curation.domain_quota(df, "host", "id", 10,
                                    priority_col="p", exact_ranks=exact)
        got = sorted((r["id"], r["host"], r["host_rank"])
                     for r in out.collect())
        assert got == [(1, "a.com", 1), (1, "b.com", 1),
                       (2, "a.com", 2)], (exact, got)


def test_domain_quota_divergent_priorities_rank_separately(spark):
    # same id, same host, different priorities: two candidates; each
    # physical copy carries its own version's rank (never both)
    df = _conflicted(spark, [(1, "h", 9.0), (2, "h", 8.0)],
                     [(1, "h", 7.0)], "id bigint, host string, p double")
    for exact in (True, False):
        out = curation.domain_quota(df, "host", "id", 10,
                                    priority_col="p", exact_ranks=exact)
        got = sorted((r["id"], r["p"], r["host_rank"])
                     for r in out.collect())
        assert got == [(1, 7.0, 3), (1, 9.0, 1), (2, 8.0, 2)], (exact, got)


def test_cdc_chunks_conflicting_copies_resolve_to_min_fp_winner(spark):
    base = "alpha beta gamma delta epsilon zeta"
    df = _conflicted(spark, [(1, base)], [(1, base + " eta")],
                     "id bigint, t string")
    out = dedup.cdc_chunks(df, "id", "t", w=3, avg_words=8)
    rows = out.collect()
    # keyed output, ONE coherent version: chunks reassemble to exactly
    # one of the two texts (the min-md5 winner), never a mix
    assert len(rows) == len({(r["id"], r["chunk_idx"]) for r in rows})
    joined = " ".join(r["chunk_text"] for r in
                      sorted(rows, key=lambda r: r["chunk_idx"]))
    import hashlib
    winner = min([base, base + " eta"],
                 key=lambda t: hashlib.md5(t.encode()).hexdigest())
    assert joined == winner


def test_novelty_score_panel_is_one_versions_not_union(spark):
    docs = _conflicted(spark, [(1, "a b c d")], [(1, "a b c x")],
                       "id bigint, t string")
    ref = spark.createDataFrame([(9, "z z z")], "id bigint, t string")
    (row,) = curation.novelty_score(docs, ref, "id", "t", n=3).collect()
    # each version alone has 2 grams; the union would have 3
    assert row["n_grams"] == 2


def test_novelty_score_all_null_text_doc_stays_addressable(spark):
    docs = spark.createDataFrame([(1, None), (1, None)],
                                 "id bigint, t string")
    ref = spark.createDataFrame([(9, "a b c")], "id bigint, t string")
    (row,) = curation.novelty_score(docs, ref, "id", "t", n=3).collect()
    assert (row["n_grams"], row["novelty"]) == (0, None)


def test_novelty_score_null_text_loses_to_real_content(spark):
    docs = spark.createDataFrame([(1, None), (1, "a b c d")],
                                 "id bigint, t string")
    ref = spark.createDataFrame([(9, "z z z")], "id bigint, t string")
    (row,) = curation.novelty_score(docs, ref, "id", "t", n=3).collect()
    assert row["n_grams"] == 2  # the real version won, not the NULL


def test_contamination_scores_each_physical_row_on_its_own_text(spark):
    corpus = _conflicted(spark, [(1, "a b c d e")], [(1, "a b c d x")],
                         "id bigint, t string")
    bench = spark.createDataFrame([(9, "a b c d")], "id bigint, t string")
    rows = sorted(((r["total_grams"], r["overlap_grams"])
                   for r in curation.benchmark_contamination(
                       corpus, bench, "id", "t", n=4).collect()))
    # version 1: grams {abcd, bcde} -> 1 overlap; version 2:
    # {abcd, bcdx} -> 1 overlap. NEVER the r9 union (3 grams) panel.
    assert rows == [(2, 1), (2, 1)]


def test_corpus_diff_sides_reduce_to_min_fingerprint(spark):
    old = spark.createDataFrame([(1, "aa"), (1, "bb")],
                                "id bigint, t string")
    new = spark.createDataFrame([(1, "aa"), (1, "cc")],
                                "id bigint, t string")
    (row,) = curation.corpus_diff(old, new, "id", "t").collect()
    # min(md5) decides each side independently and deterministically
    import hashlib
    mf = {t: hashlib.md5(t.encode()).hexdigest() for t in
          ("aa", "bb", "cc")}
    old_w = min(("aa", "bb"), key=mf.get)
    new_w = min(("aa", "cc"), key=mf.get)
    assert row["status"] == ("unchanged" if old_w == new_w else "changed")


def test_train_classifier_one_example_per_id_min_fp_winner(spark):
    base = [(i, f"tok{i} tok{i} filler", 1.0) for i in range(2, 6)]
    df = _conflicted(spark, [(1, "aa bb", 1.0)] + base,
                     [(1, "aa cc", 0.0)], "id bigint, t string, y double")
    solo_rows = [(1, "aa bb", 1.0)] + base  # winner of ("aa bb","aa cc")
    import hashlib
    if (hashlib.md5(b"aa cc").hexdigest()
            < hashlib.md5(b"aa bb").hexdigest()):
        solo_rows = [(1, "aa cc", 0.0)] + base
    solo = spark.createDataFrame(solo_rows, "id bigint, t string, y double")
    got = {r["bucket"]: r["weight"] for r in
           curation.train_quality_classifier(
               df, "id", "t", "y", dim=64, n_iter=2).collect()}
    want = {r["bucket"]: r["weight"] for r in
            curation.train_quality_classifier(
                solo, "id", "t", "y", dim=64, n_iter=2).collect()}
    assert got == want


def test_paragraph_dedup_pidx_tie_orders_by_paragraph_text(spark):
    # two versions put two different paragraphs at one (id, pidx):
    # copies MERGE per logical doc (r9 rule), every physical paragraph
    # at a winner address survives, and the reassembly order pins the
    # pidx tie with the paragraph text — fully deterministic
    df = spark.createDataFrame([(1, "zz top\nsame tail"),
                                (1, "aa bottom\nsame tail")],
                               "id bigint, t string")
    rows = dedup.paragraph_dedup(df, "id", "t").collect()
    assert len(rows) == 2  # merged panel attached to each physical row
    assert all(r["clean_text"] ==
               "aa bottom\nzz top\nsame tail\nsame tail"
               for r in rows)

"""Measure WHY content-defined chunking exists: chunk-level dedup of
near-identical documents under edits, vs fixed-offset chunking.

Corpus: every sf document plus a mutated copy with one token inserted
at the FRONT (the worst case for fixed offsets: every boundary shifts).
Both corpora chunk two ways — ``dedup.cdc_chunks`` (content-defined)
and ``curation.chunk_tokens`` (fixed windows) at the same expected
chunk length — and we measure the duplicate-word fraction: of all
chunk-words in the doubled corpus, how many sit in a chunk whose hash
already occurred (the bytes a chunk-level store would NOT re-store).

A perfect chunker would approach 0.5 (every mutant chunk after the
insertion point realigns); fixed chunking keeps only chunks whose
window happens to not straddle the shift — with a front insertion,
none, so its rate reflects only intra-corpus repetition.

Usage: python tools/cdc_study.py [sf_dir] [--json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zacks_estimates_financial_statements_spark.session import get_spark  # noqa: E402
from zacks_estimates_financial_statements_spark.operators import curation, dedup  # noqa: E402


def dup_word_fraction(chunks, hash_col: str, words_col) -> float:
    """1 − (words in first-occurrence chunks / all chunk words)."""
    agg = (chunks.groupBy(hash_col)
           .agg(F.count("*").alias("n"), F.first(words_col).alias("w"))
           .agg(F.sum(F.col("n") * F.col("w")).alias("total"),
                F.sum("w").alias("first_only"))
           .collect()[0])
    return 1.0 - agg["first_only"] / agg["total"]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                      extra_conf={"spark.ui.enabled": "false"})
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet")) \
        .select("doc_id", "text")
    mutants = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                          F.concat(F.lit("inserted "), F.col("text"))
                          .alias("text"))
    corpus = docs.unionByName(mutants)

    cdc = dedup.cdc_chunks(corpus, "doc_id", "text", w=3, avg_words=16) \
        .select("chunk_hash", "n_words")
    fixed = curation.chunk_tokens(corpus, "doc_id", "text",
                                  chunk_size=16) \
        .select("chunk_hash", "n_tokens")

    cdc_rate = dup_word_fraction(cdc, "chunk_hash", F.col("n_words"))
    fixed_rate = dup_word_fraction(fixed, "chunk_hash", F.col("n_tokens"))

    # repetition floor: the duplicate fraction the ORIGINAL corpus has
    # on its own (word-soup testdata repeats grams) — subtracting it
    # isolates the edit-realignment effect
    cdc_base = dup_word_fraction(
        dedup.cdc_chunks(docs, "doc_id", "text", w=3, avg_words=16)
        .select("chunk_hash", "n_words"), "chunk_hash", F.col("n_words"))
    fixed_base = dup_word_fraction(
        curation.chunk_tokens(docs, "doc_id", "text", chunk_size=16)
        .select("chunk_hash", "n_tokens"), "chunk_hash",
        F.col("n_tokens"))

    out = {
        "sf_dir": sf,
        "cdc_dup_word_fraction": round(cdc_rate, 4),
        "fixed_dup_word_fraction": round(fixed_rate, 4),
        "cdc_single_corpus_floor": round(cdc_base, 4),
        "fixed_single_corpus_floor": round(fixed_base, 4),
        "cdc_edit_gain": round(cdc_rate - cdc_base, 4),
        "fixed_edit_gain": round(fixed_rate - fixed_base, 4),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

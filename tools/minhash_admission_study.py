"""Incremental MinHash admission at the CORPUS x CORPUS tier — the
dedup-side sibling of tools/margin_corpus_study.py (round-8 verdict
ask #6: "incremental MinHash admission at ×10 batch over a ×10 stored
index, mirroring the margin study").

The unit tests prove incremental_minhash_pairs' RESULT (admission ==
the full-corpus pair sweep restricted to batch rows); this proves the
SCALE path end to end:

- the stored index is minhash_index over the sf0.1 documents corpus
  scaled ×1 / ×10 (re-id'd copies with one appended marker word per
  copy, so copies are near-duplicates, not byte-equal), written to
  PARQUET — the regime the operator documents (a growing corpus whose
  index is built once and persisted, never re-sketched);
- the admitted batch is a corpus-DERIVED relation that scales with the
  corpus (10% of rows at each scale, re-id'd + one-word-perturbed so
  the gate actually fires);
- admission runs with ``prune_index_scan=True``: the batch's bucket
  keys push down as an In(bucket, ...) filter against the parquet
  index, so the stored corpus is read only where probed — the 100 TB
  design claim under test;
- the same admission with the prune OFF (full index scan) runs at both
  scales as the contrast — the gap is what row-group pruning buys.

Plans are pinned live (margin-study discipline): ZERO CartesianProduct
and ZERO BroadcastNestedLoopJoin anywhere — the probe side attaches by
a broadcast-hash band/bucket equi-join, never a nested loop. Reported
per scale: index rows/build wall, admission wall (pruned + full-scan),
admitted pair count, and the ×1→×10 scaling exponent of the PRUNED
admission wall (the headline: sub-linear means the probe cost tracks
the batch, not the index).

Usage: python tools/minhash_admission_study.py   (one JSON line; also
rewrites MINHASH_ADMISSION_STUDY.json when run from the repo root)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zacks_estimates_financial_statements_spark.operators import dedup  # noqa: E402
from zacks_estimates_financial_statements_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K, BANDS = 12, 4


def synth_docs(base, copies: int, n: int):
    """×copies the documents relation: re-id'd, and every copy gets a
    per-copy salt word spliced after every 3rd word — at shingle_k=3
    that rewrites essentially every shingle, so copies are DISTINCT
    documents to the LSH (a naive append-one-marker synth left all
    copies near-dups of each other, and the admitted pair count grew
    ×copies² instead of tracking the batch — measured in the first cut
    of this study)."""
    def salted(c):
        words = F.split(F.col("text"), " ")
        spliced = F.flatten(F.transform(
            words,
            lambda w, i: F.when(i % 3 == 2,
                                F.array(w, F.lit(f"salt{c}x")))
            .otherwise(F.array(w))))
        return F.array_join(spliced, " ")

    out = base
    for c in range(1, copies):
        out = out.unionByName(base.select(
            (F.col("doc_id") + c * n).alias("doc_id"),
            salted(c).alias("text")))
    return out


def pin_plan(df, tag: str) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{tag}: cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{tag}: BNLJ"


def main() -> int:
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.ui.enabled": "false",
                    "spark.sql.shuffle.partitions": "32"})

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    base = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .filter(F.col("doc_id").isNotNull()
                    & F.col("text").isNotNull())
            .select("doc_id", "text"))
    n0 = base.count()

    root = tempfile.mkdtemp(prefix="mh_admit_")
    results = {"sf_dir": SF_DIR, "k": K, "bands": BANDS, "scales": {}}
    walls = {}
    try:
        for tag, copies in (("x1", 1), ("x10", 10)):
            corpus = synth_docs(base, copies, n0)
            n = n0 * copies
            idx_path = os.path.join(root, f"index_{tag}")
            t0 = time.time()
            dedup.minhash_index(corpus, "doc_id", "text",
                                k=K, bands=BANDS) \
                .write.parquet(idx_path)
            build_s = round(time.time() - t0, 2)
            index = spark.read.parquet(idx_path)

            # the admitted batch: 10% of the corpus, re-id'd and
            # one-word-perturbed — scales with the corpus
            batch = (corpus.filter(F.col("doc_id") % 10 == 3)
                     .select((F.col("doc_id") + 100 * n).alias("doc_id"),
                             F.concat_ws(" ", F.col("text"),
                                         F.lit("admitted"))
                             .alias("text")))

            t0 = time.time()
            pruned = dedup.incremental_minhash_pairs(
                index, batch, "doc_id", "text", k=K, bands=BANDS,
                prune_index_scan=True)
            pin_plan(pruned, f"pruned/{tag}")
            force(pruned)
            pruned_s = round(time.time() - t0, 2)

            t0 = time.time()
            full = dedup.incremental_minhash_pairs(
                index, batch, "doc_id", "text", k=K, bands=BANDS,
                prune_index_scan=False)
            pin_plan(full, f"fullscan/{tag}")
            force(full)
            full_s = round(time.time() - t0, 2)

            n_pairs = pruned.count()
            walls[tag] = pruned_s
            results["scales"][tag] = {
                "corpus_rows": n,
                "index_rows": n * BANDS,
                "index_build_s": build_s,
                "admission_pruned_s": pruned_s,
                "admission_fullscan_s": full_s,
                "admitted_pairs": n_pairs,
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)

    results["admission_scaling_exponent"] = round(
        math.log(max(walls["x10"], 0.01) / max(walls["x1"], 0.01))
        / math.log(10), 3)
    spark.stop()
    line = json.dumps(results)
    print(line)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MINHASH_ADMISSION_STUDY.json")
    with open(out, "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
